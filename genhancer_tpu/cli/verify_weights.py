"""genhancer-verify-weights — real-weights readiness drill (VERDICT r2 #8).

The MMVP-VLM north star (±0.5% vs the reference) needs pretrained tower
weights that this zero-egress container cannot fetch.  This CLI makes the
check a one-command affair the moment weights ARE available: given local HF
model dirs it runs

  1. **tower-parity digest** — loads the dir through the framework's own
     loader (registry.load_tower) AND through ``transformers`` when
     installed, runs both on a deterministic synthetic batch, and reports
     max|Δ| of image embeds / text embeds / logits (the same activation-
     parity bound the unit tests assert at ~1e-4 on tiny models);
  2. **micro-MMVP** — evaluates the benchmark dir through the full harness
     (eval/mmvp.py); ``--max-pairs`` limits to the first N pairs for a fast
     smoke (2-pair drill) before committing to the full 150-pair run.

Output: one JSON object on stdout.  Exit code 1 if the parity digest
exceeds ``--tol`` (default 5e-3 — loose enough for bf16-stored exports).

Reference consumption point this guards:
``/root/reference/evaluation/evaluate_mmvp_OpenAICLIP_336.py:159-189``
(CLIPModel.from_pretrained on the exported dir).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parity_digest(model_dir: str, tower: str, clip_image_size: int,
                  clip_type=None) -> dict:
    import os

    import jax
    import jax.numpy as jnp
    from .. import registry

    if not os.path.isdir(model_dir):
        raise FileNotFoundError(
            f"model_dir {model_dir!r} does not exist — digesting a "
            "random-init tower would report meaningless parity")
    kind, cfg = registry.tower_family_and_config(tower, clip_image_size,
                                                 clip_type)
    params, cfg = registry.load_tower(kind, cfg, model_dir)
    img_size = cfg.vision.image_size
    rng = np.random.default_rng(0)
    pixels = rng.random((2, img_size, img_size, 3)).astype(np.float32)
    vocab = cfg.text.vocab_size
    ids = rng.integers(3, max(4, vocab - 1), (2, 8)).astype(np.int64)
    ids[:, -1] = getattr(cfg.text, "eos_token_id", 2)

    from ..models.towers import clip as jclip
    from ..models.towers import siglip as jsiglip
    mod = jsiglip if kind == "siglip" else jclip
    # NHWC pixels, HF-keyed params — the same entry points the MMVP harness
    # embeds through (eval/mmvp.py:_embed_all).  Full-f32 matmuls: TPU's
    # default f32 dot precision is bf16-based, which would inflate the digest
    # ~20x above the torch fp32 reference (measured 7.5e-3 vs 4e-4) and
    # false-flag correct weights.
    with jax.default_matmul_precision("float32"):
        jimg = np.asarray(mod.get_image_features(
            params, jnp.asarray(pixels), cfg).astype(jnp.float32))
        jtxt = np.asarray(mod.get_text_features(
            params, jnp.asarray(ids), cfg).astype(jnp.float32))

    out = {"framework_image_embed_norm": float(np.linalg.norm(jimg)),
           "framework_text_embed_norm": float(np.linalg.norm(jtxt))}
    try:
        import torch
        from transformers import CLIPModel, SiglipModel
        hf_cls = SiglipModel if kind == "siglip" else CLIPModel
        hf = hf_cls.from_pretrained(model_dir).eval()
        with torch.no_grad():
            himg = hf.get_image_features(
                pixel_values=torch.from_numpy(
                    pixels.transpose(0, 3, 1, 2))).numpy()
            htxt = hf.get_text_features(
                input_ids=torch.from_numpy(ids)).numpy()
        out["hf_loaded"] = True
        out["image_embed_max_abs_diff"] = float(np.max(np.abs(jimg - himg)))
        out["text_embed_max_abs_diff"] = float(np.max(np.abs(jtxt - htxt)))
        ji = jimg / np.linalg.norm(jimg, axis=-1, keepdims=True)
        jt = jtxt / np.linalg.norm(jtxt, axis=-1, keepdims=True)
        hi = himg / np.linalg.norm(himg, axis=-1, keepdims=True)
        ht = htxt / np.linalg.norm(htxt, axis=-1, keepdims=True)
        out["logits_max_abs_diff"] = float(np.max(np.abs(ji @ jt.T - hi @ ht.T)))
    except Exception as e:  # transformers missing / incompatible dir
        out["hf_loaded"] = False
        out["hf_error"] = f"{type(e).__name__}: {e}"
    return out


def micro_mmvp(model_dir: str, benchmark_dir: str, tower: str,
               clip_image_size: int, clip_type, base_model_dir,
               max_pairs: int) -> dict:
    from ..eval import mmvp

    if max_pairs:
        # evaluate a truncated copy of the pair list through the same code
        # path: monkeypatching load_pairs keeps evaluate() itself untouched
        orig = mmvp.load_pairs
        mmvp.load_pairs = lambda d: orig(d)[:max_pairs]
    try:
        return mmvp.evaluate_model_dir(
            model_dir, benchmark_dir, tower=tower,
            clip_image_size=clip_image_size, clip_type=clip_type,
            base_model_dir=base_model_dir)
    finally:
        if max_pairs:
            mmvp.load_pairs = orig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Verify local pretrained/exported tower weights: "
                    "framework-vs-HF parity digest + micro-MMVP smoke.")
    ap.add_argument("--model-dir", required=True, help="local HF tower dir")
    ap.add_argument("--tower", default="openai_clip",
                    choices=["openai_clip", "siglip", "metaclip"])
    ap.add_argument("--clip-image-size", type=int, default=224)
    ap.add_argument("--clip-type", default=None, choices=[None, "large", "huge"])
    ap.add_argument("--benchmark-dir", default=None,
                    help="MMVP-VLM dir (Questions.csv + 'MLLM_VLM Images/'); "
                         "omit to run the parity digest only")
    ap.add_argument("--base-model-dir", default=None,
                    help="tokenizer/processor source when the export dir "
                         "lacks them (reference eval semantics)")
    ap.add_argument("--max-pairs", type=int, default=2,
                    help="pairs for the MMVP smoke (0 = full benchmark)")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max allowed embed |Δ| vs transformers")
    args = ap.parse_args(argv)

    result = {"model_dir": args.model_dir, "tower": args.tower}
    result["parity"] = parity_digest(args.model_dir, args.tower,
                                     args.clip_image_size, args.clip_type)
    ok = True
    if result["parity"].get("hf_loaded"):
        worst = max(result["parity"]["image_embed_max_abs_diff"],
                    result["parity"]["text_embed_max_abs_diff"])
        ok = worst <= args.tol
        result["parity"]["within_tol"] = ok

    if args.benchmark_dir:
        result["mmvp"] = micro_mmvp(
            args.model_dir, args.benchmark_dir, args.tower,
            args.clip_image_size, args.clip_type, args.base_model_dir,
            args.max_pairs)

    result["ok"] = ok
    print(json.dumps(result, indent=2))
    return 0 if ok else 1


def cli():
    sys.exit(main())


if __name__ == "__main__":
    cli()
