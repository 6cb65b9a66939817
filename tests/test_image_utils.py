"""Image utils parity (reference src/flux/util.py:52-109,
dataset_cc3m.py:66-88,124-166): crop geometry, HWC3 channel handling,
pad64 arithmetic, anyres packing invariants checked against a direct
per-image patchification."""
import numpy as np
import pytest

from genhancer_tpu.data import image_utils as U


class TestCrops:
    def test_c_crop_square(self):
        img = np.arange(5 * 8 * 3, dtype=np.uint8).reshape(5, 8, 3)
        out = U.c_crop(img)
        assert out.shape == (5, 5, 3)
        # center: columns 1..6 of 8 (offset (8-5)//2 = 1)
        np.testing.assert_array_equal(out, img[:, 1:6])

    def test_c_crop_tall(self):
        img = np.zeros((10, 4, 3), np.uint8)
        assert U.c_crop(img).shape == (4, 4, 3)

    @pytest.mark.parametrize("ratio,exp", [("16:9", (9, 16)), ("4:3", (9, 12)),
                                           ("1:1", (9, 9))])
    def test_crop_to_aspect_ratio(self, ratio, exp):
        img = np.zeros((9, 100, 3), np.uint8)
        assert U.crop_to_aspect_ratio(img, ratio).shape[:2] == exp

    def test_crop_to_aspect_vertical(self):
        img = np.zeros((100, 16, 3), np.uint8)
        assert U.crop_to_aspect_ratio(img, "16:9").shape[:2] == (9, 16)


class TestPadAndChannels:
    def test_pad64(self):
        assert U.pad64(64) == 0
        assert U.pad64(65) == 63
        assert U.pad64(1) == 63
        assert U.pad64(128) == 0

    def test_hwc3_gray(self):
        g = np.full((4, 4), 7, np.uint8)
        out = U.HWC3(g)
        assert out.shape == (4, 4, 3)
        assert (out == 7).all()

    def test_hwc3_rgba_composites_over_white(self):
        x = np.zeros((1, 1, 4), np.uint8)
        x[0, 0] = [100, 0, 0, 0]          # fully transparent -> white
        np.testing.assert_array_equal(U.HWC3(x)[0, 0], [255, 255, 255])
        x[0, 0] = [100, 20, 30, 255]      # opaque -> color
        np.testing.assert_array_equal(U.HWC3(x)[0, 0], [100, 20, 30])

    def test_resize_with_pad_roundtrip(self):
        img = np.random.default_rng(0).integers(0, 255, (100, 150, 3)).astype(np.uint8)
        padded, remove = U.resize_image_with_pad(img, 64)
        assert padded.shape[0] % 64 == 0 and padded.shape[1] % 64 == 0
        un = remove(padded)
        # short side resized to 64: 100->64, 150->96
        assert un.shape == (64, 96, 3)

    def test_resize_with_pad_zero_resolution_passthrough(self):
        img = np.zeros((10, 10, 3), np.uint8)
        out, remove = U.resize_image_with_pad(img, 0)
        np.testing.assert_array_equal(out, img)
        np.testing.assert_array_equal(remove(out), img)


class TestCollateAnyres:
    def _images(self):
        rng = np.random.default_rng(3)
        p = 4
        shapes = [(3, 8, 12), (3, 16, 4), (3, 4, 4)]
        images = [rng.normal(size=s).astype(np.float32) for s in shapes]
        sizes = [(s[1] // p, s[2] // p) for s in shapes]
        return images, sizes, p

    def test_packing_invariants(self):
        images, sizes, p = self._images()
        packed, cu, max_len, grid, isz = U.collate_anyres(images, sizes, p,
                                                          max_size=64)
        lens = [ph * pw for ph, pw in sizes]
        assert cu.tolist() == [0] + list(np.cumsum(lens))
        assert max_len == max(lens)
        assert packed.shape == (sum(lens), p * p * 3)
        assert grid.shape == (sum(lens),)

    def test_packed_tokens_match_direct_patchify(self):
        images, sizes, p = self._images()
        packed, cu, _, grid, _ = U.collate_anyres(images, sizes, p, max_size=64)
        mpn = 64 // p
        for i, (im, (ph, pw)) in enumerate(zip(images, sizes)):
            seg = packed[cu[i]:cu[i + 1]]
            gseg = grid[cu[i]:cu[i + 1]]
            # direct: c h p w q -> h w (p q c)
            c, H, W = im.shape
            ref = im.reshape(c, ph, p, pw, p).transpose(1, 3, 2, 4, 0)
            ref = ref.reshape(ph * pw, p * p * c)
            np.testing.assert_allclose(seg, ref, rtol=1e-6)
            rows, cols = np.divmod(gseg, mpn)
            np.testing.assert_array_equal(
                rows, np.repeat(np.arange(ph), pw))
            np.testing.assert_array_equal(
                cols, np.tile(np.arange(pw), ph))
