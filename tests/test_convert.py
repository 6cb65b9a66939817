"""Dataset converter tests: synthetic videos -> shards -> loaders round trip."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from genhancer_tpu.data.convert import video_to_wds as C
from genhancer_tpu.data import video as video_loaders, wds


def write_video(path, n_frames=12, size=64, fps=8, moving=True):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, (size, size))
    for i in range(n_frames):
        frame = np.full((size, size, 3), 30, np.uint8)
        x = (i * 4) % (size - 16) if moving else 10
        frame[10:26, x:x + 16] = (200, 60, 60)
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    cls = d / "walk"
    cls.mkdir()
    for i in range(3):
        write_video(str(cls / f"v{i}.mp4"), n_frames=10 + i)
    return str(d)


class TestSelection:
    def test_ssim_identical_is_one(self):
        a = np.random.default_rng(0).integers(0, 255, (64, 64), np.uint8)
        assert C.ssim(a, a) > 0.99

    def test_ssim_different_lower(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 255, (64, 64), np.uint8)
        b = rng.integers(0, 255, (64, 64), np.uint8)
        assert C.ssim(a, b) < 0.5

    def test_triplet_selection_endpoints(self):
        frames = [np.full((32, 32, 3), i * 20, np.uint8) for i in range(5)]
        sel = C.select_triplet(frames, "pixel_diff" if False else "ssim")
        assert sel[0] == 0 and sel[2] == 4 and 0 < sel[1] < 4

    def test_pair_top_difference(self):
        frames = [np.full((32, 32, 3), 0, np.uint8) for _ in range(4)]
        frames.append(np.full((32, 32, 3), 255, np.uint8))
        pairs = C.select_pairs(frames, selection="top_difference",
                               difference_method="pixel_diff", n_pairs=1)
        assert pairs == [(3, 4)]


class TestConvert:
    @pytest.mark.parametrize("dtype,min_frames", [("triplet", 3),
                                                  ("full_frames", 4)])
    def test_convert_and_load(self, video_dir, tmp_path, dtype, min_frames):
        out = str(tmp_path / f"wds_{dtype}")
        n = C.convert_videos(video_dir, out, dataset_type=dtype,
                             sample_mode="fixed", sample_rate=1,
                             max_frames=8, shard_size=2,
                             method="ssim")
        assert n == 3
        shards = wds.expand_shards(out)
        assert len(shards) == 2  # shard_size 2 -> 2 shards for 3 samples
        groups = []
        for s in shards:
            groups += list(wds.group_by_directory(wds.iter_tar_samples(s)))
        assert len(groups) == 3
        assert all(len(g["frames"]) >= min_frames for g in groups)
        assert groups[0]["txt"] == b"walk"

        # loaders consume the converted shards
        mode = "triplet" if dtype == "triplet" else "sliding"
        kwargs = dict(window_cond=3, max_windows_per_video=2) if mode == "sliding" else {}
        ld = video_loaders.loader(mode=mode, train_batch_size=2, num_workers=1,
                                  video_dir=shards, img_size=32, seed=0,
                                  repeat=False, **kwargs)
        b = next(iter(ld))
        assert b["target"].shape[-3:] == (32, 32, 3)

    def test_frame_pair_convert(self, video_dir, tmp_path):
        out = str(tmp_path / "wds_pairs")
        n = C.convert_videos(video_dir, out, dataset_type="frame_pair",
                             sample_mode="fixed", max_frames=5,
                             pair_selection_method="top_difference",
                             pair_difference_method="pixel_diff",
                             n_pairs_per_video=2)
        assert n == 6  # 3 videos x 2 pairs

    def test_cli(self, video_dir, tmp_path):
        from genhancer_tpu.cli.convert_dataset import main
        out = str(tmp_path / "cli_out")
        n = main(["--input_dir", video_dir, "--output_dir", out,
                  "--dataset_type", "triplet", "--sample_mode", "fixed",
                  "--max_frames", "6", "--method", "ssim"])
        assert n == 3
        assert os.listdir(out)
