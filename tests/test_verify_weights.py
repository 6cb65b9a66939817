"""genhancer-verify-weights CLI (cli/verify_weights.py, VERDICT r2 #8):
parity digest + micro-MMVP against a tiny exported HF dir fixture."""
import json

import pytest

from test_towers import tiny_hf_clip


@pytest.fixture(scope="module")
def exported_clip_dir(tmp_path_factory):
    model, cfg = tiny_hf_clip()
    d = tmp_path_factory.mktemp("hf_clip_export")
    model.save_pretrained(str(d), safe_serialization=False)
    return str(d)


class TestVerifyWeights:
    def test_parity_digest_on_hf_dir(self, exported_clip_dir):
        from genhancer_tpu.cli.verify_weights import parity_digest
        out = parity_digest(exported_clip_dir, "openai_clip", 224)
        assert out["hf_loaded"], out.get("hf_error")
        # same weights through both stacks: activation parity like the unit
        # tests (~1e-4 fp32 on tiny models)
        assert out["image_embed_max_abs_diff"] < 5e-4
        assert out["text_embed_max_abs_diff"] < 5e-4
        assert out["logits_max_abs_diff"] < 5e-4

    def test_cli_end_to_end_json(self, exported_clip_dir, capsys):
        from genhancer_tpu.cli.verify_weights import main
        rc = main(["--model-dir", exported_clip_dir])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0 and out["ok"] and out["parity"]["within_tol"]

    def test_cli_micro_mmvp(self, exported_clip_dir, capsys, monkeypatch,
                            tmp_path_factory):
        # reuse the MMVP micro-benchmark fixture factory + toy tokenizer
        import test_mmvp
        bench = test_mmvp.micro_benchmark.__wrapped__(tmp_path_factory)
        from genhancer_tpu.eval import mmvp
        monkeypatch.setattr(mmvp, "default_tokenizer",
                            lambda d, k: test_mmvp.fake_tokenize)
        from genhancer_tpu.cli.verify_weights import main
        rc = main(["--model-dir", exported_clip_dir,
                   "--benchmark-dir", bench, "--max-pairs", "2"])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert "average_score" in out["mmvp"]

    def test_missing_dir_fails_loudly(self):
        from genhancer_tpu.cli.verify_weights import parity_digest
        with pytest.raises(Exception):
            parity_digest("/nonexistent/dir/xyz", "openai_clip", 224)
