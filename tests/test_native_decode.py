"""Native C++ batched JPEG decoder tests (skipped if toolchain unavailable)."""
import io

import numpy as np
import pytest
from PIL import Image

from genhancer_tpu.data import native_decode as nd

pytestmark = pytest.mark.skipif(not nd.available(),
                                reason="native decoder not built")


def jpeg(arr: np.ndarray) -> bytes:
    b = io.BytesIO()
    Image.fromarray(arr).save(b, format="JPEG", quality=95)
    return b.getvalue()


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(0)
    out = []
    for shape in [(480, 640), (100, 80), (224, 224)]:
        g = np.linspace(0, 255, shape[1], dtype=np.uint8)[None, :, None]
        out.append(jpeg(np.broadcast_to(g, shape + (3,)).copy()))
    return out


class TestNativeDecode:
    def test_get_dims(self, blobs):
        dims = nd.get_dims(blobs)
        assert dims.tolist() == [[640, 480], [80, 100], [224, 224]]

    def test_center_decode_matches_pil_on_smooth(self, blobs):
        from genhancer_tpu.data.transforms import video_frame_transform
        imgs, ok = nd.decode_batch_center(blobs, 64)
        assert ok.all() and imgs.shape == (3, 64, 64, 3)
        for i, b in enumerate(blobs):
            ref = video_frame_transform(b, 64)
            assert np.abs(imgs[i] - ref).mean() < 0.02

    def test_bad_jpeg_flagged_not_crashing(self, blobs):
        imgs, ok = nd.decode_batch_center([b"garbage", blobs[0]], 32)
        assert ok.tolist() == [False, True]
        assert np.all(imgs[0] == 0)

    def test_random_crop_deterministic_given_rng(self, blobs):
        a, _ = nd.decode_batch_random_crop(blobs, 48, np.random.default_rng(7))
        b, _ = nd.decode_batch_random_crop(blobs, 48, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_loaders_use_native_path(self, tmp_path):
        from genhancer_tpu.data import cc3m, testing
        shard = testing.make_image_shard(str(tmp_path / "s.tar"), 6, 96)
        ld = cc3m.loader(train_batch_size=2, num_workers=1, img_dir=[shard],
                         img_size=32, seed=0, repeat=False)
        b = next(iter(ld))
        assert b["image"].shape == (2, 32, 32, 3)
        assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
