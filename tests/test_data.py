"""Data layer tests over synthetic tar fixtures (SURVEY.md §4)."""
import os

import numpy as np
import pytest

from genhancer_tpu.data import cc3m, testing, transforms, video, wds
from genhancer_tpu.data.prefetch import DevicePrefetcher


@pytest.fixture(scope="module")
def image_shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgshards")
    return [testing.make_image_shard(str(d / f"shard-{i:03d}.tar"), 8, 64, seed=i)
            for i in range(3)]


@pytest.fixture(scope="module")
def video_shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("vidshards")
    return [testing.make_video_shard(str(d / f"vid-{i:03d}.tar"), 4, 6, 64, seed=i)
            for i in range(2)]


class TestWds:
    def test_expand_brace(self):
        got = wds.expand_shards("/x/shard-{000..002}.tar")
        assert got == ["/x/shard-000.tar", "/x/shard-001.tar", "/x/shard-002.tar"]

    def test_expand_dir_and_glob(self, image_shards):
        d = os.path.dirname(image_shards[0])
        assert wds.expand_shards(d) == sorted(image_shards)
        assert wds.expand_shards(os.path.join(d, "*.tar")) == sorted(image_shards)

    def test_split_shards_partition(self):
        shards = [f"s{i}" for i in range(10)]
        parts = [wds.split_shards(shards, i, 3) for i in range(3)]
        assert sorted(sum(parts, [])) == sorted(shards)
        assert not (set(parts[0]) & set(parts[1]))

    def test_iter_tar_samples(self, image_shards):
        samples = list(wds.iter_tar_samples(image_shards[0]))
        assert len(samples) == 8
        assert {"jpg", "txt", "__key__"} <= set(samples[0])

    def test_group_by_directory(self, video_shards):
        samples = wds.iter_tar_samples(video_shards[0])
        groups = list(wds.group_by_directory(samples))
        assert len(groups) == 4
        assert len(groups[0]["frames"]) == 6
        # frames sorted by index
        keys = [k for k, _ in groups[0]["frames"]]
        assert keys == sorted(keys, key=wds._frame_index)
        assert groups[0]["txt"] is not None

    def test_shuffle_preserves_multiset(self):
        rng = np.random.default_rng(0)
        out = list(wds.shuffled(iter(range(100)), 10, rng))
        assert sorted(out) == list(range(100))
        assert out != list(range(100))

    def test_stream_repeat(self, image_shards):
        st = wds.ShardStream(image_shards, repeat=True)
        it = iter(st)
        seen = [next(it)["__key__"] for _ in range(30)]  # > 24 total samples
        assert len(seen) == 30


class TestTransforms:
    def test_random_resized_crop_shape(self, image_shards):
        s = next(iter(wds.iter_tar_samples(image_shards[0])))
        rng = np.random.default_rng(0)
        out = transforms.train_image_transform(s["jpg"], 32, rng)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_center_crop_nonsquare(self):
        from PIL import Image
        img = Image.new("RGB", (100, 60), (255, 0, 0))
        out = transforms.resize_center_crop(img, 48)
        assert out.size == (48, 48)


class TestCC3M:
    def test_loader_batches(self, image_shards):
        ld = cc3m.loader(train_batch_size=4, num_workers=2,
                         img_dir=image_shards, img_size=32, seed=0, repeat=False)
        batches = list(ld)
        assert len(batches) >= 5  # 24 samples / 4
        b = batches[0]
        assert b["image"].shape == (4, 32, 32, 3)
        assert len(b["text"]) == 4

    def test_loader_reference_signature(self, image_shards):
        # loader(**data_config) with the reference YAML keys must work
        ld = cc3m.loader(train_batch_size=2, num_workers=1,
                         img_size=32, img_dir=image_shards, seed=0,
                         patch_size=1, repeat=False)
        assert next(iter(ld))["image"].shape[0] == 2


class TestVideoLoaders:
    @pytest.mark.parametrize("mode,n_cond", [("triplet", 2), ("next", 1), ("next2", 2)])
    def test_modes(self, video_shards, mode, n_cond):
        ld = video.loader(mode=mode, train_batch_size=2, num_workers=2,
                          video_dir=video_shards, img_size=32, seed=0, repeat=False)
        b = next(iter(ld))
        assert b["cond"].shape == (2, n_cond, 32, 32, 3)
        assert b["target"].shape == (2, 32, 32, 3)
        assert b["valid"].all()

    def test_sliding_window(self, video_shards):
        ld = video.loader(mode="sliding", train_batch_size=2, num_workers=2,
                          video_dir=video_shards, img_size=32, seed=0,
                          window_cond=3, window_stride=1, max_windows_per_video=2,
                          repeat=False)
        b = next(iter(ld))
        assert b["cond"].shape == (4, 3, 32, 32, 3)   # 2 videos * 2 windows
        assert b["target"].shape == (4, 32, 32, 3)
        assert b["bs_eff"] <= 4 and b["valid"].sum() == b["bs_eff"]

    def test_sliding_respects_max_frames(self, video_shards):
        ld = video.loader(mode="sliding", train_batch_size=1, num_workers=1,
                          video_dir=video_shards, img_size=32, seed=0,
                          max_windows_per_video=8, max_frames_per_video=5,
                          repeat=False)
        b = next(iter(ld))
        # 5 frames, window_cond 3 -> starts 0..1 -> 2 windows max per video
        assert b["bs_eff"] <= 2


class TestPrefetch:
    def test_prefetcher_yields_device_arrays(self, image_shards):
        import jax
        ld = cc3m.loader(train_batch_size=2, num_workers=1, img_dir=image_shards,
                         img_size=32, seed=0, repeat=False)
        pf = DevicePrefetcher(ld, mesh=None, depth=2)
        b = next(iter(pf))
        assert isinstance(b["image"], jax.Array)
        assert isinstance(b["text"], list)

    def test_prefetcher_propagates_errors(self):
        def bad():
            yield {"x": np.ones(2)}
            raise RuntimeError("boom")
        pf = DevicePrefetcher(bad())
        it = iter(pf)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            next(it)
            next(it)
