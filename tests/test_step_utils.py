"""stack_microbatches normalization: ragged epoch-boundary groups must keep
the validity mask and never feed np.stack ragged shapes (code-review r2
finding: a padded partial final batch either crashed the stack or silently
dropped 'valid', training on zero pad rows unmasked)."""
import numpy as np
import pytest

from genhancer_tpu.train.step_utils import stack_microbatches


def _b(n, valid=None):
    out = {"image": np.random.default_rng(n).random((n, 4, 4, 3)).astype(np.float32)}
    if valid is not None:
        out["valid"] = np.asarray(valid, bool)
    return out


class TestStackMicrobatches:
    def test_uniform_group_passthrough(self):
        s = stack_microbatches([_b(8), _b(8)])
        assert s["image"].shape == (2, 8, 4, 4, 3)
        assert "valid" not in s

    def test_partial_batch_with_mask_keeps_mask_everywhere(self):
        full = _b(8)
        partial = _b(8, valid=[True] * 5 + [False] * 3)  # padded by loader
        s = stack_microbatches([full, partial])
        assert s["valid"].shape == (2, 8)
        assert s["valid"][0].all()                      # synthesized all-True
        assert s["valid"][1].tolist() == [True] * 5 + [False] * 3

    def test_ragged_sizes_padded_with_false_mask(self):
        s = stack_microbatches([_b(8), _b(6)])
        assert s["image"].shape == (2, 8, 4, 4, 3)
        assert s["valid"][0].all()
        assert s["valid"][1].tolist() == [True] * 6 + [False] * 2
        # pad rows are zeros
        assert (s["image"][1, 6:] == 0).all()

    def test_missing_non_mask_key_raises(self):
        a = _b(4)
        b = dict(_b(4), cond=np.zeros((4, 2), np.float32))
        with pytest.raises(ValueError, match="missing keys"):
            stack_microbatches([b, a])
