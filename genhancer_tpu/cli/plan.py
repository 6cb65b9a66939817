"""Planning CLI: shape-only memory & parallelism preflight.

``genhancer-plan --config configs/test_SigLIP_384_stage1.yaml \
    --num_devices 8 --hbm-gb 16 [--json]``

Builds the exact state-tree layout with jax.eval_shape (no weights, no
data IO), applies the trainer's real placement rules, and prints per-chip
residency plus the cheapest knob escalation that fits — so "does it fit"
is answered in seconds on a laptop instead of by an OOM on the pod.
"""

from __future__ import annotations

import argparse
import json


def _fmt(e: dict) -> str:
    k = e["knobs"]
    knobs = ", ".join(f"{n}={v}" for n, v in k.items() if v not in (False, 1))
    return (f"  {e['name']:<42} dp{e['dp']}xtp{e['tp']}  "
            f"params {e['trainable_gib'] + e['frozen_gib']:6.2f}  "
            f"opt {e['opt_state_gib']:5.2f}  grads {e['grads_gib']:5.2f}  "
            f"act~{e['activations_gib_est']:5.2f}  "
            f"total {e['total_gib']:6.2f} GiB  "
            f"{'FITS' if e['fits'] else 'OOM '}"
            + (f"  [{knobs}]" if knobs else ""))


def main(argv=None):
    parser = argparse.ArgumentParser(description="genhancer memory planner")
    parser.add_argument("--config", required=True)
    parser.add_argument("--num_devices", type=int, default=None,
                        help="devices to plan for (default: config / visible)")
    parser.add_argument("--hbm-gb", type=float, default=16.0,
                        help="per-chip HBM budget in GiB (v5e: 16, v4: 32, "
                             "v5p: 95)")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable single-line output")
    args = parser.parse_args(argv)

    from ..train.config import load_config
    from ..train.plan import plan

    cfg = load_config(args.config)
    report = plan(cfg, num_devices=args.num_devices, hbm_gb=args.hbm_gb)

    if args.json:
        print(json.dumps(report))
        return report

    print(f"task {report['task']}  devices {report['num_devices']}  "
          f"budget {report['hbm_gb']} GiB/chip")
    for e in report["candidates"]:
        print(_fmt(e))
    print(f"activation note: {report['configured']['activation_note']}")
    print(f"recommendation: {report['recommendation']}")
    return report


def cli() -> None:
    main()


if __name__ == "__main__":
    cli()
