"""Precomputed conditioning: cache the frozen stage-1 compute to shards.

Stage-1 trains only the projectors + DiT; the VAE encoder and the tower are
frozen, yet the reference recomputes them on every step of every epoch
(``train_OpenAICLIP_video_stage1.py:370-438``).  Video schedules make many
passes over a small corpus (626 steps x 32 samples over a few hundred
videos), so this module runs the frozen paths ONCE over a dataset and
writes webdataset-style shards of per-frame features; the loaders then
assemble training samples from cached features and the task loss skips the
VAE/tower entirely (tasks/image.py, tasks/video.py branch on batch keys).

Exactness: the cache stores the VAE posterior **moments** (mean/logvar), not
a sampled latent — the per-step sampling noise is still drawn fresh on
device from the step PRNG, so the training distribution is bit-identical to
the inline path (video frames use the deterministic resize transform; video
modes have no augmentation to lose).  Image mode is augmentation-preserving
via per-image variant stacks of the reference RandomResizedCrop transform
(``precompute_image_dir(augment="train", variants=K)`` — exactness analysis
in its docstring); the legacy center-crop cache remains as
``augment="center"``.

Format: per frame (video) ``{video_key}/{frame}.feat.npz`` with arrays
``moments`` [h, w, 2z] f32, ``patches`` [L_p, D] bf16-as-f16, ``vec`` [P]
f32; per image ``{key}.feat.npz`` with ``moments``, ``cls`` (plus the
original ``txt`` member passed through).  Tower features are pre-projection
(frozen tower only — stage-2, which trains the tower, must not use a
features cache and the factory rejects the combination).

Stage-2 latent cache (``mode="latents"``): stage-2 trains the tower, so its
features cannot be cached — but the VAE encoder is frozen in EVERY stage.
Latents mode stores ``moments`` plus the transformed crop ``pixels``
([S, S, 3] f16 in [0,1], stacked [K, ...] per variant) instead of tower
features; the loader emits ``{"image", "moments"}`` batches and the task
loss samples the posterior from the cache while running the tower live on
the SAME crop the moments were computed from.  f16 pixel storage bounds the
crop round-trip error at ~5e-4 relative (below the bf16 tower input
quantization), so the training distribution is preserved to compute
precision.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vae as vae_m
from ..tasks.conditioning import normalize, tower_stats, tower_features, VAE_MEAN, VAE_STD


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def load_feat(blob: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(blob)) as z:
        return {k: z[k] for k in z.files}


class ShardWriter:
    """Rotating tar writer (``pre-%06d.tar`` every ``samples_per_shard``
    LOGICAL samples).

    ``add_group`` writes all members of one logical sample (an image's
    feat.npz+txt pair, or a whole video's frames) atomically into the same
    shard — shards may only split BETWEEN groups.  Splitting a video across
    shards would be corruption, not inefficiency: the training-time shard
    list is shuffled/split per node, so a straddled video surfaces as two
    truncated videos with wrong middle/last-frame semantics."""

    def __init__(self, out_dir: str, samples_per_shard: int = 1000,
                 prefix: str = "pre"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.per_shard = samples_per_shard
        self.prefix = prefix
        self.groups = 0
        self.shard_idx = 0
        self.tf: Optional[tarfile.TarFile] = None

    def _roll(self):
        if self.tf is not None:
            self.tf.close()
        path = os.path.join(self.out_dir,
                            f"{self.prefix}-{self.shard_idx:06d}.tar")
        self.tf = tarfile.open(path, "w")
        self.shard_idx += 1

    def add_group(self, members):
        """members: iterable of (name, bytes) — one logical sample."""
        if self.tf is None or (self.groups and
                               self.groups % self.per_shard == 0):
            self._roll()
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            self.tf.addfile(info, io.BytesIO(data))
        self.groups += 1

    def close(self):
        if self.tf is not None:
            self.tf.close()
            self.tf = None


def make_frozen_fn(tower_kind: str, tower_params, tower_cfg, vae_params,
                   vae_cfg, *, vae_dtype=jnp.float32,
                   compute_dtype=jnp.bfloat16, with_patches: bool):
    """jitted pixels [B, H, W, 3] in [0,1] -> frozen features.

    Returns moments (pre-sampling VAE posterior) + tower outputs: ``cls``
    (projected class token) always; ``patches`` too when ``with_patches``
    (video conditioning needs them).

    Params are jit ARGUMENTS (partial-ed in after tracing), never closures —
    a closed-over param tree would be lowered as MLIR constants, which both
    bloats the module and forces a device→host fetch of every weight at
    lowering time (observed hanging for minutes over the axon relay).
    """

    @jax.jit
    def fn(tp, vp, px01):
        vae_in = normalize(px01, VAE_MEAN, VAE_STD).astype(vae_dtype)
        moments = vae_m.encoder_forward(vp["encoder"], vae_cfg, vae_in)
        mean, std = tower_stats(tower_kind)
        tpx = normalize(px01, mean, std).astype(compute_dtype)
        cls_tok, patches = tower_features(tower_kind, {"model": tp}, tpx,
                                          tower_cfg)
        out = {"moments": moments.astype(jnp.float32),
               "cls": cls_tok.astype(jnp.float32)}
        if with_patches:
            out["patches"] = patches.astype(jnp.bfloat16)
        return out

    import functools
    return functools.partial(fn, tower_params, vae_params)


def make_frozen_latent_fn(vae_params, vae_cfg, *, vae_dtype=jnp.float32):
    """jitted pixels [B, H, W, 3] in [0,1] -> {"moments"} only — the
    stage-2 latent cache (no tower: stage-2 trains it live)."""

    @jax.jit
    def fn(vp, px01):
        vae_in = normalize(px01, VAE_MEAN, VAE_STD).astype(vae_dtype)
        moments = vae_m.encoder_forward(vp["encoder"], vae_cfg, vae_in)
        return {"moments": moments.astype(jnp.float32)}

    import functools
    return functools.partial(fn, vae_params)


def _batched(fn, arrs: np.ndarray, batch: int) -> Dict[str, np.ndarray]:
    """Run ``fn`` over ``arrs`` in fixed-size batches (last one padded so jit
    sees one shape); returns stacked host arrays of the true length."""
    n = arrs.shape[0]
    outs = []
    for s in range(0, n, batch):
        chunk = arrs[s:s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        out = fn(jnp.asarray(chunk))
        outs.append({k: np.asarray(v)[:batch - pad] for k, v in out.items()})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def precompute_video_dir(video_dir, out_dir: str, frozen_fn, img_size: int,
                         batch: int = 16, samples_per_shard: int = 2000,
                         num_workers: int = 4) -> int:
    """Cache every frame of every video; returns frames written.

    Output frames keep their ``video_key/frame`` keys so the standard video
    loaders (triplet/pair/2-frame/sliding) assemble samples from the cache
    exactly as they would from pixels.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .transforms import video_frame_transform
    from .wds import ShardStream

    stream = ShardStream(video_dir, shuffle_buffer=0, repeat=False,
                         group_videos=True)
    writer = ShardWriter(out_dir, samples_per_shard)
    written = 0
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for video in stream:
            frames = video["frames"]
            try:
                arr = np.stack(list(pool.map(
                    lambda f: video_frame_transform(f[1], img_size), frames)))
            except Exception:
                continue
            feats = _batched(frozen_fn, arr, batch)
            # one video = one atomic group: shards never split mid-video
            writer.add_group(
                (f"{fkey}.feat.npz",            # fkey already carries the dir
                 _npz_bytes(moments=feats["moments"][i],
                            patches=feats["patches"][i].astype(np.float16),
                            cls=feats["cls"][i]))
                for i, (fkey, _) in enumerate(frames))
            written += len(frames)
    writer.close()
    return written


def precompute_image_dir(img_dir, out_dir: str, frozen_fn, img_size: int,
                         batch: int = 32, samples_per_shard: int = 2000,
                         num_workers: int = 4, augment: str = "center",
                         variants: int = 1, seed: int = 0,
                         mode: str = "features") -> int:
    """Cache CC3M-style image shards; returns samples written.

    ``mode="latents"`` (stage-2 cache): ``frozen_fn`` should be
    ``make_frozen_latent_fn`` (moments only) and each variant's transformed
    crop is stored alongside as f16 ``pixels`` — the tower trains live on
    the exact crop the moments came from.

    ``augment="center"`` keeps the deterministic center-crop cache (one
    feature set per image).  ``augment="train"`` is the
    **augmentation-preserving** mode (VERDICT r2 #1a): each image is cached
    as ``variants`` i.i.d. draws of the reference training transform
    (RandomResizedCrop scale 0.9-1.0 bicubic, ``dataset_cc3m.py:91-121``)
    under a deterministic per-image key stream, stored stacked
    (``moments [K, h, w, 2z]``, ``cls [K, P]``); the loader picks one
    variant uniformly at random per visit.  Since the variants are i.i.d.
    samples of the augmentation distribution, a uniformly-chosen variant IS
    a fresh draw from that distribution — marginally exact.  The only delta
    vs inline augmentation is across *revisits* of the same image, which
    share the K-point pool (repeat-crop probability 1/K per revisit pair);
    the reference image schedule (100k steps x bs16 x accum2 over ~3M CC3M
    images, ``test_SigLIP_384_stage1.yaml``) visits each image ~1.07 times,
    so K=4 bounds the fraction of non-independent crops below ~2%.
    """
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    from .transforms import eval_image_transform, train_image_transform
    from .wds import ShardStream

    if augment not in ("center", "train"):
        raise ValueError(f"augment must be center|train, got {augment!r}")
    if augment == "center" and variants != 1:
        raise ValueError("variants > 1 requires augment='train'")
    if mode not in ("features", "latents"):
        raise ValueError(f"mode must be features|latents, got {mode!r}")
    k_var = variants if augment == "train" else 1

    stream = ShardStream(img_dir, shuffle_buffer=0, repeat=False)
    writer = ShardWriter(out_dir, samples_per_shard)
    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
    written = 0
    keys, imgs, txts = [], [], []

    def flush():
        nonlocal written
        if not imgs:
            return
        # imgs: per image a list of k_var crops -> one flat device batch
        flat = np.stack([crop for per_img in imgs for crop in per_img])
        feats = _batched(frozen_fn, flat, batch)
        for i, k in enumerate(keys):
            sl = slice(i * k_var, (i + 1) * k_var)
            take = (lambda a: a[sl.start]) if k_var == 1 else (lambda a: a[sl])
            arrays = {name: take(arr) for name, arr in feats.items()}
            if mode == "latents":
                # the exact crops the moments came from — the tower trains
                # live on these (f16: ~5e-4 round-trip, below bf16 input
                # quantization)
                arrays["pixels"] = take(flat.astype(np.float16))
            # feat.npz + txt land in the same shard (one atomic group)
            writer.add_group([
                (f"{k}.feat.npz", _npz_bytes(**arrays)),
                (f"{k}.txt", txts[i]),
            ])
            written += 1
        keys.clear(), imgs.clear(), txts.clear()

    def decode(sample):
        jpg = sample.get("jpg") or sample.get("jpeg") or sample.get("png")
        if jpg is None:
            return None
        try:
            if augment == "train":
                rng = np.random.default_rng(
                    (seed, zlib.crc32(sample["__key__"].encode())))
                return [train_image_transform(jpg, img_size, rng)
                        for _ in range(k_var)]
            return [eval_image_transform(jpg, img_size)]
        except Exception:
            return None

    pending = []
    for sample in stream:
        pending.append((sample, pool.submit(decode, sample)))
        if len(pending) >= batch * 2:
            for s, fut in pending:
                img = fut.result()
                if img is None:
                    continue
                imgs.append(img)
                keys.append(s["__key__"])
                txts.append(s.get("txt", b""))
                if len(imgs) >= batch:
                    flush()
            pending = []
    for s, fut in pending:
        img = fut.result()
        if img is None:
            continue
        imgs.append(img)
        keys.append(s["__key__"])
        txts.append(s.get("txt", b""))
    flush()
    pool.shutdown()
    writer.close()
    return written
