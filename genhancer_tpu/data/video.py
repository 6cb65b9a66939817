"""Video webdataset pipelines — all four conditioning modes.

Replaces ``image_datasets/dataset_video.py`` (triplet),
``dataset_video_nextpredic.py`` (random consecutive pair),
``dataset_video.py`` aliased for the 2-frame trainer, and
``dataset_video_sliding_window.py`` (full_frames + mask).  Every mode emits
the same device-ready batch::

    {"cond":   float32 [B, n_cond, H, W, 3] in [0,1],
     "target": float32 [B, H, W, 3],
     "valid":  bool [B]}

so a single video task implementation (tasks.video) serves all trainers.
Sliding-window batches are pre-windowed on the host (vectorized numpy
indexing, replacing the reference's on-device per-video Python loop,
``train_OpenAICLIP_sliding_windows_nextpredic_stage1.py:149-209``) and padded
to the static size ``train_batch_size * max_windows_per_video`` with a
validity mask so jit shapes never change.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from .transforms import video_frame_transform
from .wds import ShardStream


def _assemble_precomputed(cond_feats: List[Dict], target_feats: Dict) -> Dict:
    """Cached-feature example: patches stay float16 (halving host RAM and
    host->device bytes for the batch's largest tensor; the loss casts to
    compute_dtype on device anyway)."""
    return {
        "cond_patches": np.stack([f["patches"] for f in cond_feats]),
        "cond_vecs": np.stack([f["cls"] for f in cond_feats]),
        "moments": target_feats["moments"],
    }


class VideoLoaderBase:
    def __init__(self, video_dir, train_batch_size: int = 4, num_workers: int = 4,
                 img_size: int = 224, seed: int = 0, shuffle_buffer: int = 100,
                 node_index: int = 0, node_count: int = 1, repeat: bool = True,
                 min_frames: int = 3, precomputed: bool = False, **_unused):
        self.batch_size = train_batch_size
        self.img_size = img_size
        self.min_frames = min_frames
        self.precomputed = precomputed
        self.rng = np.random.default_rng(seed)
        self.stream = ShardStream(video_dir, node_index=node_index,
                                  node_count=node_count,
                                  shuffle_buffer=shuffle_buffer, seed=seed,
                                  repeat=repeat, group_videos=True)
        self.num_workers = max(1, num_workers)
        self.pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def _decode_frames(self, frames: List, indices: List[int]) -> Optional[np.ndarray]:
        from . import native_decode as nd
        if nd.available():
            arrs, ok = nd.decode_batch_center(
                [frames[i][1] for i in indices], self.img_size,
                num_threads=self.num_workers)
            return arrs if bool(ok.all()) else None
        try:
            imgs = list(self.pool.map(
                lambda i: video_frame_transform(frames[i][1], self.img_size), indices))
            return np.stack(imgs)
        except Exception:
            return None

    def _gather(self, frames: List, cond_idx: List[int],
                target_idx: int) -> Optional[Dict]:
        """Build one example: pixel mode -> {cond, target}; precomputed mode
        (frames carry .feat.npz blobs from data.precompute) ->
        {cond_patches, cond_vecs, moments} — the task loss skips the frozen
        tower/VAE for these batches."""
        if not self.precomputed:
            arr = self._decode_frames(frames, cond_idx + [target_idx])
            if arr is None:
                return None
            return {"cond": arr[:-1], "target": arr[-1]}
        from .precompute import load_feat
        try:
            feats = [load_feat(frames[i][1]) for i in cond_idx]
            tgt = load_feat(frames[target_idx][1])
        except Exception:
            return None
        return _assemble_precomputed(feats, tgt)

    def select_indices(self, n_frames: int) -> Optional[List[int]]:
        raise NotImplementedError

    def sample_to_example(self, video) -> Optional[Dict]:
        frames = video["frames"]
        if len(frames) < self.min_frames:
            return None
        idx = self.select_indices(len(frames))
        if idx is None:
            return None
        return self._gather(frames, idx[:-1], idx[-1])

    def _check_yields(self, seen: int, produced: int) -> None:
        """A precomputed stream that produces nothing is a configuration
        error (e.g. precomputed: true pointed at pixel shards) — without
        this check a repeating stream spins forever yielding no batches."""
        if self.precomputed and produced == 0 and seen >= 100:
            raise RuntimeError(
                f"precomputed video loader produced 0 examples from the "
                f"first {seen} videos — are these .feat.npz shards written "
                f"by genhancer-precompute (not pixel shards)?")

    def __iter__(self) -> Iterator[Dict]:
        pending: List[Dict] = []
        seen = produced = 0
        for video in self.stream:
            seen += 1
            ex = self.sample_to_example(video)
            if ex is None:
                self._check_yields(seen, produced)
                continue
            produced += 1
            pending.append(ex)
            if len(pending) == self.batch_size:
                out = {k: np.stack([e[k] for e in pending]) for k in pending[0]}
                out["valid"] = np.ones(self.batch_size, bool)
                yield out
                pending = []


class TripletLoader(VideoLoaderBase):
    """Middle-frame interpolation: cond=(first, last), target=middle
    (dataset_video.py:215-217)."""

    def sample_to_example(self, video):
        frames = video["frames"]
        n = len(frames)
        if n < 3:
            return None
        return self._gather(frames, [0, n - 1], n // 2)


class NextFrameLoader(VideoLoaderBase):
    """Next-frame prediction: cond=(random frame,), target=its successor
    (dataset_video_nextpredic.py:215-222)."""

    def __init__(self, *a, **kw):
        kw.setdefault("min_frames", 2)
        super().__init__(*a, **kw)

    def sample_to_example(self, video):
        frames = video["frames"]
        n = len(frames)
        if n < 2:
            return None
        i = int(self.rng.integers(0, n - 1))
        return self._gather(frames, [i], i + 1)


class TwoFrameLoader(VideoLoaderBase):
    """2-frame conditioning: cond=(first, middle), target=last — the
    use2frames trainers reuse the triplet dataset with aliased fields."""

    def sample_to_example(self, video):
        frames = video["frames"]
        n = len(frames)
        if n < 3:
            return None
        return self._gather(frames, [0, n // 2], n - 1)


class SlidingWindowLoader(VideoLoaderBase):
    """Full-frames mode with host-side window building.

    Per video of T frames: window starts range(0, T - window_cond,
    window_stride); up to ``max_windows_per_video`` sampled without
    replacement (sorted); each window -> (cond frames s..s+2, target
    s+window_cond).  Batch = train_batch_size videos worth of windows padded
    to the static size with valid=False rows.
    """

    def __init__(self, *a, window_cond: int = 3, window_stride: int = 1,
                 max_windows_per_video: int = 8, max_frames_per_video: int = 200,
                 **kw):
        kw.setdefault("min_frames", 4)
        super().__init__(*a, **kw)
        self.window_cond = window_cond
        self.window_stride = window_stride
        self.max_windows = max_windows_per_video
        self.max_frames = max_frames_per_video

    def video_windows(self, video) -> List[Dict]:
        frames = video["frames"][: self.max_frames]
        t = len(frames)
        if t < self.window_cond + 1:
            return []
        starts = list(range(0, t - self.window_cond, self.window_stride))
        if not starts:
            return []
        if self.max_windows and len(starts) > self.max_windows:
            starts = sorted(self.rng.choice(len(starts), self.max_windows,
                                            replace=False))
            starts = [int(s) * self.window_stride for s in starts]
        needed = sorted({s + o for s in starts for o in range(self.window_cond + 1)})
        if self.precomputed:
            from .precompute import load_feat
            try:
                feats = {f: load_feat(frames[f][1]) for f in needed}
            except Exception:
                return []
            return [_assemble_precomputed(
                        [feats[s + o] for o in range(self.window_cond)],
                        feats[s + self.window_cond])
                    for s in starts]
        arr_all = self._decode_frames(frames, needed)
        if arr_all is None:
            return []
        pos = {f: i for i, f in enumerate(needed)}
        out = []
        for s in starts:
            cond = arr_all[[pos[s + o] for o in range(self.window_cond)]]
            out.append({"cond": cond, "target": arr_all[pos[s + self.window_cond]]})
        return out

    def __iter__(self) -> Iterator[Dict]:
        static_bs = self.batch_size * self.max_windows
        windows: List[Dict] = []
        videos_in_batch = 0
        seen = produced = 0
        for video in self.stream:
            seen += 1
            ws = self.video_windows(video)
            if not ws:
                self._check_yields(seen, produced)
                continue
            produced += 1
            windows.extend(ws)
            videos_in_batch += 1
            if videos_in_batch == self.batch_size:
                yield self._emit(windows[:static_bs], static_bs)
                windows, videos_in_batch = [], 0

    def _emit(self, windows, static_bs) -> Dict:
        n = len(windows)
        out = {k: np.zeros((static_bs,) + np.shape(windows[0][k]),
                           np.asarray(windows[0][k]).dtype)
               for k in windows[0]}
        valid = np.zeros(static_bs, bool)
        for i, w in enumerate(windows):
            for k, v in w.items():
                out[k][i] = v
            valid[i] = True
        return {**out, "valid": valid,
                "avg_windows_per_video": n / max(1, self.batch_size), "bs_eff": n}


LOADERS = {
    "triplet": TripletLoader,
    "next": NextFrameLoader,
    "next2": TwoFrameLoader,
    "sliding": SlidingWindowLoader,
    "full_frames": SlidingWindowLoader,
}


def loader(mode: str = "triplet", train_batch_size: int = 4, num_workers: int = 4,
           **kwargs):
    """Reference-compatible entry (dataset_video*.py ``loader``); ``mode``
    picks the conditioning family, ``return_mode: full_frames`` maps to
    sliding-window."""
    cls = LOADERS[kwargs.pop("return_mode", mode) if mode == "sliding" else mode]
    return cls(train_batch_size=train_batch_size, num_workers=num_workers, **kwargs)
