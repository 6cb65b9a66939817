"""MMVP-VLM harness tests: protocol parity vs the reference scoring rules
executed through HF torch on a micro-benchmark fixture (SURVEY.md §4)."""
import csv
import os

import numpy as np
import pytest
import torch

from genhancer_tpu.eval import mmvp
from genhancer_tpu.weights import hf_convert

from test_towers import tiny_hf_clip  # reuse the tiny HF model factory
from genhancer_tpu.models.towers import clip as jclip


@pytest.fixture(scope="module")
def micro_benchmark(tmp_path_factory):
    """2 categories x 2 pairs with random images."""
    from PIL import Image
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("mmvp")
    cats = ["Color and Appearance", "Texts"]
    rows = [["qid", "type", "statement"]]
    qid = 1
    for cat in cats:
        d = root / "MLLM_VLM Images" / cat
        d.mkdir(parents=True, exist_ok=True)
        for _ in range(2):  # 2 pairs
            for q in (qid, qid + 1):
                arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{q}.jpg")
                rows.append([str(q), cat, f"statement number {q}"])
            qid += 2
    with open(root / "Questions.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(root)


def fake_tokenize(texts, length=12):
    """Deterministic toy tokenizer: hash chars into ids; eos id 2 at end."""
    ids = np.full((len(texts), length), 1, dtype=np.int64)
    for i, t in enumerate(texts):
        for j, ch in enumerate(t[: length - 1]):
            ids[i, j] = 3 + (ord(ch) % 40)
        ids[i, min(len(t), length - 1)] = 2
    return ids, None


def reference_protocol_torch(model, benchmark_dir, image_size):
    """Independent numpy/torch implementation of the reference scoring
    (evaluate_mmvp_OpenAICLIP_336.py:31-110) using identical preprocessing."""
    pairs = mmvp.load_pairs(benchmark_dir)
    cat_correct, cat_total = {}, {}
    for pair in pairs:
        imgs = np.stack([mmvp.preprocess_image(p, "clip", image_size)
                         for p in (pair.img1, pair.img2)])
        imgs_t = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        preds = []
        for text in (pair.text1, pair.text2):
            ids, _ = fake_tokenize([text])
            with torch.no_grad():
                out = model(input_ids=torch.from_numpy(ids), pixel_values=imgs_t)
            probs = out.logits_per_text.softmax(dim=-1).numpy()
            preds.append("img1" if probs[0][0] > 0.5 else "img2")
        gts = ["img1" if pair.qid1 % 2 == 1 else "img2",
               "img1" if pair.qid2 % 2 == 1 else "img2"]
        ok = preds[0] == gts[0] and preds[1] == gts[1]
        cat_correct[pair.category] = cat_correct.get(pair.category, 0) + int(ok)
        cat_total[pair.category] = cat_total.get(pair.category, 0) + 1
    out = {c: 100.0 * cat_correct[c] / cat_total[c] for c in cat_correct}
    out["average_score"] = float(np.mean(list(out.values())))
    return out


REF_CATEGORIES = [
    'Orientation and Direction', 'Presence of Specific Features',
    'State and Condition', 'Quantity and Count',
    'Positional and Relational Context', 'Color and Appearance',
    'Structural Characteristics', 'Texts', 'Viewpoint and Perspective']


@pytest.fixture(scope="module")
def full_shape_benchmark(tmp_path_factory):
    """9 categories x 15 pairs — the REAL MMVP-VLM shape.  The reference's
    ``benchmark_model`` assigns categories POSITIONALLY
    (``categories[num_pairs // 15]``, evaluate_mmvp_OpenAICLIP_336.py:96)
    and divides by ``num_pairs // 9`` (:107), so only this exact shape
    drives it without a ZeroDivisionError."""
    from PIL import Image
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("mmvp_full")
    rows = [["qid", "type", "statement"]]
    qid = 1
    for cat in REF_CATEGORIES:
        d = root / "MLLM_VLM Images" / cat
        d.mkdir(parents=True, exist_ok=True)
        for _ in range(15):
            for q in (qid, qid + 1):
                arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{q}.jpg")
                rows.append([str(q), cat, f"statement number {q}"])
            qid += 2
    with open(root / "Questions.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(root)


class _ProcessorShim:
    """CLIPImageProcessor stand-in over OUR preprocessing helpers (the
    zero-egress container has no pretrained processor files): shortest-edge
    resize + center crop + rescale + normalize — the semantics
    ``mmvp.preprocess_image`` implements and its docstring pins to the HF
    processor.  Returns the [1, 3, H, W] torch tensor benchmark_model
    expects from ``processor.preprocess(img, return_tensors='pt')``."""

    def __init__(self, image_size: int):
        self.image_size = image_size

    def preprocess(self, img, return_tensors="pt"):
        import jax.numpy as jnp
        from genhancer_tpu.tasks.conditioning import normalize, tower_stats
        arr = mmvp.to_float01(
            mmvp.resize_center_crop(img.convert("RGB"), self.image_size))
        mean, std = tower_stats("clip")
        arr = np.asarray(normalize(jnp.asarray(arr), mean, std))
        return {"pixel_values": torch.from_numpy(
            arr.transpose(2, 0, 1).copy())[None]}


class _TokenizerShim:
    """CLIPTokenizer stand-in: same injected ``fake_tokenize`` both stacks
    use (tokenization is a dependency, not part of the scoring protocol);
    ignores the reference's max_length=77 kwargs — the tiny model's
    max_position_embeddings is 12."""

    def __call__(self, text, **kw):
        ids, _ = fake_tokenize([text])
        return {"input_ids": torch.from_numpy(ids)}


class TestMMVP:
    def test_load_pairs(self, micro_benchmark):
        pairs = mmvp.load_pairs(micro_benchmark)
        assert len(pairs) == 4
        assert pairs[0].qid1 == 1 and pairs[0].qid2 == 2
        assert pairs[0].text1.startswith("a photo of ")
        assert os.path.exists(pairs[0].img1)

    @pytest.mark.slow
    def test_accuracy_parity_vs_reference_protocol(self, micro_benchmark):
        model, _ = tiny_hf_clip()
        jcfg = jclip.CLIPConfig.from_hf(model.config.to_dict())
        params = hf_convert.tower_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        ours = mmvp.evaluate(params, jcfg, "clip", micro_benchmark,
                             fake_tokenize, image_size=28)
        ref = reference_protocol_torch(model, micro_benchmark, 28)
        assert ours.keys() == ref.keys()
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], atol=1e-9,
                                       err_msg=f"category {k}")

    @pytest.mark.slow
    def test_parity_vs_reference_benchmark_model(self, full_shape_benchmark,
                                                 tmp_path, monkeypatch):
        """Drive the reference's ACTUAL ``benchmark_model``
        (/root/reference/evaluation/evaluate_mmvp_OpenAICLIP_336.py:11-112,
        imported read-only) on the full-shape fixture with the same tiny HF
        CLIPModel, and assert per-pair prediction identity + category-score
        identity with ``eval/mmvp.evaluate`` — upgrading 'parity vs our
        torch reimplementation of the protocol' to 'parity vs the
        reference's own code' (VERDICT r4 #8)."""
        import importlib.util
        spec_ = importlib.util.spec_from_file_location(
            "ref_mmvp_eval",
            "/root/reference/evaluation/evaluate_mmvp_OpenAICLIP_336.py")
        ref_mod = importlib.util.module_from_spec(spec_)
        spec_.loader.exec_module(ref_mod)

        model, _ = tiny_hf_clip()
        # benchmark_model writes Prediction_Results_OpenAICLIP into CWD
        monkeypatch.chdir(tmp_path)
        ref = ref_mod.benchmark_model(_ProcessorShim(28), _TokenizerShim(),
                                      model, full_shape_benchmark,
                                      device="cpu")

        jcfg = jclip.CLIPConfig.from_hf(model.config.to_dict())
        params = hf_convert.tower_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        ours_csv = str(tmp_path / "ours.csv")
        ours = mmvp.evaluate(params, jcfg, "clip", full_shape_benchmark,
                             fake_tokenize, image_size=28,
                             results_csv=ours_csv)

        # category scores + average, to float noise
        assert set(ours) == set(ref)
        for k in ref:
            np.testing.assert_allclose(ours[k], ref[k], atol=1e-9,
                                       err_msg=f"category {k}")

        # per-pair prediction identity from the two artifacts
        with open(tmp_path / "Prediction_Results_OpenAICLIP") as f:
            ref_rows = {(r[0], r[1]): (r[2], r[3])
                        for r in list(csv.reader(f))[1:]}
        with open(ours_csv) as f:
            our_rows = {(r[0], r[1]): (r[2], r[3])
                        for r in list(csv.reader(f))[1:]}
        assert ref_rows == our_rows and len(ref_rows) == 135

    def test_results_csv_written(self, micro_benchmark, tmp_path):
        model, _ = tiny_hf_clip()
        jcfg = jclip.CLIPConfig.from_hf(model.config.to_dict())
        params = hf_convert.tower_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        out_csv = str(tmp_path / "results.csv")
        mmvp.evaluate(params, jcfg, "clip", micro_benchmark, fake_tokenize,
                      image_size=28, results_csv=out_csv)
        with open(out_csv) as f:
            rows = list(csv.reader(f))
        assert rows[0][:4] == ["qid1", "qid2", "pred1", "pred2"]
        assert len(rows) == 5

    def test_siglip_scoring_path(self, micro_benchmark):
        from test_towers import tiny_hf_siglip
        from genhancer_tpu.models.towers import siglip as jsiglip
        model, _ = tiny_hf_siglip()
        jcfg = jsiglip.SiglipConfig.from_hf(model.config.to_dict())
        params = hf_convert.tower_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        res = mmvp.evaluate(params, jcfg, "siglip", micro_benchmark,
                            fake_tokenize, image_size=28)
        assert "average_score" in res
        assert all(0.0 <= v <= 100.0 for v in res.values())
