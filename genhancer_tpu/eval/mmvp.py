"""MMVP-VLM pairwise evaluation harness (all tower variants).

Protocol parity with ``/root/reference/evaluation/evaluate_mmvp_*.py``:
  * ``Questions.csv`` rows consumed in consecutive pairs; images at
    ``MLLM_VLM Images/{category}/{qid}.jpg`` (:11-46);
  * prompt = ``'a photo of ' + statement`` (:48-49);
  * per text: ``softmax(logits_per_text)`` over [img1, img2]; pred=img1 iff
    p > 0.5; GT img1 iff qid odd; a pair scores only if BOTH texts correct
    (:82-99) — softmax scoring applies to SigLIP too (the reference uses the
    same rule for all families);
  * per-category % over 15 pairs + ``average_score`` (:104-110); raw rows
    dumped to a ``Prediction_Results_*`` CSV (:16-18,94).

TPU-native difference: instead of 2 model calls per pair, ALL image and text
embeddings are computed in a few batched jit forwards, then the pairwise
softmax runs vectorized — the embedding reuse is exact (the protocol's
logits are pure dot products of per-item embeddings).

Fixes reference quirk Q7: this is a real library + CLI with
``--benchmark_dir``/``--model_dir`` flags (the reference hardcodes paths).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import decode_image, resize_center_crop, to_float01
from ..models.towers import clip as clip_m
from ..models.towers import siglip as siglip_m
from ..tasks.conditioning import normalize, tower_stats

CATEGORIES = [
    "Orientation and Direction", "Presence of Specific Features",
    "State and Condition", "Quantity and Count",
    "Positional and Relational Context", "Color and Appearance",
    "Structural Characteristics", "Texts",
    "Viewpoint and Perspective",
]


@dataclass
class Pair:
    qid1: int
    qid2: int
    category: str
    text1: str
    text2: str
    img1: str
    img2: str


def load_pairs(benchmark_dir: str) -> List[Pair]:
    image_dir = os.path.join(benchmark_dir, "MLLM_VLM Images")
    csv_file = os.path.join(benchmark_dir, "Questions.csv")
    pairs: List[Pair] = []
    with open(csv_file) as f:
        reader = csv.reader(f)
        next(reader)  # header
        rows = list(reader)
    for i in range(0, len(rows) - 1, 2):
        qid1, qtype1, stmt1 = rows[i][:3]
        qid2, qtype2, stmt2 = rows[i + 1][:3]
        pairs.append(Pair(
            qid1=int(qid1), qid2=int(qid2), category=qtype1,
            text1="a photo of " + stmt1, text2="a photo of " + stmt2,
            img1=os.path.join(image_dir, qtype1, f"{int(qid1)}.jpg"),
            img2=os.path.join(image_dir, qtype1, f"{int(qid2)}.jpg")))
    return pairs


def preprocess_image(path: str, kind: str, image_size: int) -> np.ndarray:
    """HF processor semantics: CLIPImageProcessor = shortest-edge resize +
    center crop; SiglipImageProcessor = direct (size,size) resize.  Both
    bicubic + rescale + mean/std normalize."""
    img = decode_image(open(path, "rb").read())
    if kind == "siglip":
        from PIL import Image
        img = img.resize((image_size, image_size), Image.BICUBIC)
    else:
        img = resize_center_crop(img, image_size)
    arr = to_float01(img)
    mean, std = tower_stats(kind)
    return np.asarray(normalize(jnp.asarray(arr), mean, std))


def default_tokenizer(model_dir: str, kind: str) -> Callable:
    """HF tokenizer from the model dir; returns texts -> (ids, mask|None)."""
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(model_dir)
    if kind == "siglip":
        def fn(texts):
            out = tok(texts, padding="max_length", truncation=True,
                      max_length=64, return_tensors="np")
            return out["input_ids"], None  # reference passes no attention mask
    else:
        def fn(texts):
            out = tok(texts, padding="max_length", truncation=True,
                      max_length=77, return_tensors="np")
            return out["input_ids"], None
    return fn


def _embed_all(params, cfg, kind: str, images: np.ndarray, input_ids: np.ndarray,
               batch: int = 50):
    """Batched jit image/text embeddings (fp32)."""
    if kind == "siglip":
        img_fn = jax.jit(lambda p, x: siglip_m.get_image_features(p, x, cfg))
        txt_fn = jax.jit(lambda p, t: siglip_m.get_text_features(p, t, cfg))
    else:
        img_fn = jax.jit(lambda p, x: clip_m.get_image_features(p, x, cfg))
        txt_fn = jax.jit(lambda p, t: clip_m.get_text_features(p, t, cfg))
    img_out, txt_out = [], []
    for i in range(0, len(images), batch):
        img_out.append(np.asarray(img_fn(params, jnp.asarray(images[i:i + batch]))))
    for i in range(0, len(input_ids), batch):
        txt_out.append(np.asarray(txt_fn(params, jnp.asarray(input_ids[i:i + batch]))))
    return np.concatenate(img_out), np.concatenate(txt_out)


def evaluate(params, cfg, kind: str, benchmark_dir: str,
             tokenize: Callable, image_size: Optional[int] = None,
             results_csv: Optional[str] = None, batch: int = 50) -> Dict[str, float]:
    """Run the full benchmark; returns {category: pct, 'average_score': pct}."""
    pairs = load_pairs(benchmark_dir)
    image_size = image_size or cfg.vision.image_size

    images = np.stack([preprocess_image(p, kind, image_size)
                       for pair in pairs for p in (pair.img1, pair.img2)])
    texts = [t for pair in pairs for t in (pair.text1, pair.text2)]
    input_ids, _ = tokenize(texts)

    img_emb, txt_emb = _embed_all(params, cfg, kind, images, np.asarray(input_ids),
                                  batch)
    img_emb = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    txt_emb = txt_emb / np.linalg.norm(txt_emb, axis=-1, keepdims=True)
    # .reshape(()) handles both scalar and shape-[1] checkpoints without
    # tripping NumPy's ndim>0 -> scalar deprecation (error on NumPy>=2.3)
    scale = float(np.exp(np.asarray(params["logit_scale"]).reshape(())))
    bias = float(np.asarray(params.get("logit_bias", 0.0)).reshape(()))

    cat_correct: Dict[str, int] = {}
    cat_total: Dict[str, int] = {}
    rows = []
    for i, pair in enumerate(pairs):
        ims = img_emb[2 * i: 2 * i + 2]          # [2, d]
        preds, scores = [], []
        for j, txt in enumerate(txt_emb[2 * i: 2 * i + 2]):
            logits = scale * (txt @ ims.T) + bias
            p = np.exp(logits - logits.max())
            p = p / p.sum()
            scores.append(float(p[0]))
            preds.append("img1" if p[0] > 0.5 else "img2")
        gts = ["img1" if pair.qid1 % 2 == 1 else "img2",
               "img1" if pair.qid2 % 2 == 1 else "img2"]
        ok = preds[0] == gts[0] and preds[1] == gts[1]
        cat_correct[pair.category] = cat_correct.get(pair.category, 0) + int(ok)
        cat_total[pair.category] = cat_total.get(pair.category, 0) + 1
        rows.append([pair.qid1, pair.qid2, preds[0], preds[1], gts[0], gts[1],
                     scores[0], scores[1]])

    if results_csv:
        with open(results_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["qid1", "qid2", "pred1", "pred2", "gt1", "gt2",
                        "q1score", "q2score"])
            w.writerows(rows)

    out = {c: 100.0 * cat_correct[c] / cat_total[c] for c in cat_correct}
    out["average_score"] = float(np.mean(list(out.values())))
    return out


def evaluate_model_dir(model_dir: str, benchmark_dir: str, tower: str = "openai_clip",
                       clip_image_size: int = 224, clip_type: Optional[str] = None,
                       base_model_dir: Optional[str] = None,
                       results_csv: Optional[str] = None) -> Dict[str, float]:
    """Load an (exported) HF tower dir and evaluate — the end-to-end path used
    after stage-2 training.  ``base_model_dir`` supplies tokenizer/processor
    files when the export dir lacks them (reference loads those from the base
    model, evaluate_mmvp_OpenAICLIP_336.py:153-154)."""
    from .. import registry
    if not os.path.isdir(model_dir):
        raise FileNotFoundError(
            f"model_dir {model_dir!r} does not exist — evaluating a random-init "
            "tower would silently report garbage accuracy")
    kind, cfg = registry.tower_family_and_config(tower, clip_image_size, clip_type)
    params, cfg = registry.load_tower(kind, cfg, model_dir)
    tok_dir = base_model_dir or model_dir
    tokenize = default_tokenizer(tok_dir, kind)
    # preprocess at the LOADED tower's resolution (the reference builds its
    # processor from the model dir, so the export's size is authoritative)
    return evaluate(params, cfg, kind, benchmark_dir, tokenize,
                    image_size=cfg.vision.image_size, results_csv=results_csv)
