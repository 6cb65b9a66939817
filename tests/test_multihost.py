"""Multi-host data parallelism: 2-process × 4-virtual-CPU-device cluster vs
the single-process 8-device run (VERDICT r1 #3).  Loss must match exactly:
the per-host input feeding (host_local_batch_slice +
jax.make_array_from_process_local_data) assembles the same global batch, and
the checkpoint save/resume round-trip (#6) continues identically."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(nprocs: int, outdir: str, timeout: int = 1500):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(nprocs), str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)]
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    results = []
    for i in range(nprocs):
        with open(os.path.join(outdir, f"result.{nprocs}proc.{i}.json")) as f:
            results.append(json.load(f))
    return results


def test_two_process_matches_single_process(tmp_path):
    single = _run(1, str(tmp_path / "single"))
    os.makedirs(tmp_path / "double", exist_ok=True)
    double = _run(2, str(tmp_path / "double"))

    # both processes of the 2-proc run agree (loss is a global pmean)
    np.testing.assert_allclose(double[0]["losses"], double[1]["losses"],
                               rtol=1e-6)
    # and match the single-process global-batch run, including the step
    # after the checkpoint round-trip
    np.testing.assert_allclose(double[0]["losses"], single[0]["losses"],
                               rtol=1e-5)
    assert double[0]["step"] == single[0]["step"] == 3

    # FSDP segment: params sharded over the cross-host data axis must
    # reproduce the replicated run's losses (same init/batch/keys)
    np.testing.assert_allclose(double[0]["fsdp_losses"],
                               double[1]["fsdp_losses"], rtol=1e-6)
    np.testing.assert_allclose(double[0]["fsdp_losses"],
                               single[0]["fsdp_losses"], rtol=1e-5)
    np.testing.assert_allclose(double[0]["fsdp_losses"],
                               double[0]["losses"][:2], rtol=1e-5)
