"""CC3M (image-text) webdataset pipeline — image-mode training input.

Equivalent of ``image_datasets/dataset_cc3m.py``: streaming tar shards of
{jpg, txt}, shuffle buffer, RandomResizedCrop(scale 0.9-1.0, bicubic), batch
collation.  Emits ``{"image": float32 [B, H, W, 3] in [0,1], "text": [str]}``
— NO normalization here (done once on device, SURVEY.md Q1).

``loader(train_batch_size, num_workers, img_size, img_dir, seed, ...)``
preserves the reference loader signature (``dataset_cc3m.py:220-222``).
Decoding runs in a thread pool (PIL releases the GIL for JPEG work).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .transforms import train_image_transform, eval_image_transform
from .wds import ShardStream


class CC3MLoader:
    def __init__(self, img_dir, train_batch_size: int = 16, num_workers: int = 4,
                 img_size: int = 224, seed: int = 0, patch_size: int = 1,
                 shuffle_buffer: int = 2000, train: bool = True,
                 node_index: int = 0, node_count: int = 1, repeat: bool = True,
                 precomputed: bool = False, **_unused):
        self.batch_size = train_batch_size
        self.img_size = img_size
        self.train = train
        self.precomputed = precomputed
        self.num_workers = max(1, num_workers)
        self.rng = np.random.default_rng(seed)
        self.stream = ShardStream(img_dir, node_index=node_index,
                                  node_count=node_count,
                                  shuffle_buffer=shuffle_buffer if train else 0,
                                  seed=seed, repeat=repeat)
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def _decode(self, sample) -> Optional[tuple]:
        jpg = sample.get("jpg") or sample.get("jpeg") or sample.get("png")
        if jpg is None:
            return None
        try:
            if self.train:
                img = train_image_transform(jpg, self.img_size, self.rng)
            else:
                img = eval_image_transform(jpg, self.img_size)
        except Exception:
            return None
        txt = sample.get("txt", b"")
        return img, txt.decode("utf-8", "replace") if isinstance(txt, bytes) else str(txt)

    def _iter_native(self) -> Iterator[Dict]:
        """Fast path: batched decode in the native C++ library (no GIL)."""
        from . import native_decode as nd
        images, texts = [], []
        sample_iter = iter(self.stream)
        done = False
        while not done:
            blobs, txts = [], []
            while len(blobs) < self.batch_size * 2:
                try:
                    s = next(sample_iter)
                except StopIteration:
                    done = True
                    break
                jpg = s.get("jpg") or s.get("jpeg")
                if jpg is None:
                    continue
                t = s.get("txt", b"")
                blobs.append(jpg)
                txts.append(t.decode("utf-8", "replace") if isinstance(t, bytes) else str(t))
            if blobs:
                if self.train:
                    arrs, ok = nd.decode_batch_random_crop(
                        blobs, self.img_size, self.rng, num_threads=self.num_workers)
                else:
                    arrs, ok = nd.decode_batch_center(
                        blobs, self.img_size, num_threads=self.num_workers)
                for i in range(len(blobs)):
                    if not ok[i]:
                        continue
                    images.append(arrs[i])
                    texts.append(txts[i])
                    if len(images) == self.batch_size:
                        yield self._batch(images, texts)
                        images, texts = [], []
        if images:
            yield self._batch(images, texts)

    def _iter_precomputed(self) -> Iterator[Dict]:
        """Batches from .feat.npz shards (data.precompute).

        Features cache (stage-1): {moments, cls} — the task loss skips the
        frozen VAE AND tower.  Latent cache (``precomputed: "latents"``,
        usable in every stage incl. stage-2): {moments, pixels} — the loss
        skips only the VAE and runs the tower live on the cached crop."""
        from .precompute import load_feat
        cols: Dict[str, list] = {}
        texts = []
        seen = loaded = 0
        want_latents = self.precomputed == "latents"

        def emit():
            out = {k: np.stack(v) for k, v in cols.items()}
            if "pixels" in out:
                out["image"] = out.pop("pixels").astype(np.float32)
            out["text"] = list(texts)
            return out

        for sample in self.stream:
            seen += 1
            blob = sample.get("feat.npz")
            if blob is None:
                # a precomputed stream with no usable samples is a config
                # error (pixel shards?) — fail instead of spinning forever
                if loaded == 0 and seen >= 200:
                    raise RuntimeError(
                        "precomputed image loader found no .feat.npz in "
                        f"the first {seen} samples — are these shards "
                        "written by genhancer-precompute?")
                continue
            try:
                feats = load_feat(blob)
            except Exception:
                continue
            if loaded == 0:
                if want_latents and "pixels" not in feats:
                    raise RuntimeError(
                        "precomputed: 'latents' but the cache has no pixels "
                        "member — re-run genhancer-precompute --mode latents "
                        "(stage-2 trains the tower and needs the crops)")
                if not want_latents and "cls" not in feats:
                    raise RuntimeError(
                        "features cache expected (precomputed: true) but the "
                        "shards are a latents cache — set precomputed: "
                        "'latents' in data_config")
            loaded += 1
            if feats["moments"].ndim == 4:
                # augmentation-preserving cache (data.precompute variants>1):
                # K i.i.d. RandomResizedCrop draws per image — a uniformly-
                # drawn variant is a fresh draw from the reference
                # augmentation distribution (same j for every member so the
                # moments/crop pair stays consistent)
                j = int(self.rng.integers(feats["moments"].shape[0]))
                for k, v in feats.items():
                    cols.setdefault(k, []).append(v[j])
            else:
                for k, v in feats.items():
                    cols.setdefault(k, []).append(v)
            t = sample.get("txt", b"")
            texts.append(t.decode("utf-8", "replace")
                         if isinstance(t, bytes) else str(t))
            if len(texts) == self.batch_size:
                yield emit()
                cols, texts = {}, []
        if texts:
            yield emit()

    def __iter__(self) -> Iterator[Dict]:
        if self.precomputed:
            yield from self._iter_precomputed()
            return
        from . import native_decode as nd
        if nd.available():
            yield from self._iter_native()
            return
        images, texts = [], []
        sample_iter = iter(self.stream)
        while True:
            futures = []
            for _ in range(self.batch_size * 2):
                try:
                    futures.append(self.pool.submit(self._decode, next(sample_iter)))
                except StopIteration:
                    break
            if not futures:
                if images:
                    yield self._batch(images, texts)
                return
            for fut in futures:
                res = fut.result()
                if res is None:
                    continue
                images.append(res[0])
                texts.append(res[1])
                if len(images) == self.batch_size:
                    yield self._batch(images, texts)
                    images, texts = [], []

    @staticmethod
    def _batch(images, texts) -> Dict:
        return {"image": np.stack(images), "text": list(texts)}


def loader(train_batch_size: int = 16, num_workers: int = 4, **kwargs) -> CC3MLoader:
    """Reference-compatible entry point (dataset_cc3m.py:220)."""
    return CC3MLoader(train_batch_size=train_batch_size,
                      num_workers=num_workers, **kwargs)
