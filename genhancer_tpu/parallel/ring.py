"""Ring attention: exact softmax attention with the sequence axis sharded
over a device mesh axis — the TPU-native long-context scaling path.

Motivation.  The flash kernels (core/pallas/flash_attention.py) keep
activation memory O(B*H*L*D) on ONE chip, which is what lets the video
sliding-window mode (L=2169 joint tokens, SURVEY.md §2.3/§2.4; reference
workload train_OpenAICLIP_sliding_windows_nextpredic_stage2_all.py) train
without remat.  Beyond one chip's HBM — more windows, more frames, higher
resolution — the L axis itself must shard.  Plain GSPMD handles the
per-token ops (MLPs, norms, modulation) for free once activations carry a
PartitionSpec over L; attention is the one op that mixes tokens.  Naive
GSPMD there all-gathers full K/V onto every device (peak memory back to
O(L), no overlap).  Ring attention instead rotates K/V shards around the
mesh axis with `ppermute` while accumulating the softmax online — peak
memory O(L/n) per device and the ICI transfer of the next chunk overlaps
the matmuls of the current one (jax-ml scaling-book collective-matmul
pattern; arXiv:2310.01889).

Design:

  * forward: n ring steps; per step one [B, H, Lq/n, Lkv/n] f32 score tile
    against the resident K/V chunk, merged into a running (o, m, den) online
    softmax state (exactly the flash-attention recurrence, at chunk rather
    than block granularity).  Emits per-row lse = m + log(den) as the VJP
    residual — the same statistic the Pallas flash forward now saves.
  * backward: a second ring pass.  dq accumulates on the local device;
    dk/dv accumulators TRAVEL WITH their K/V chunk (rotated together), so
    after n steps every chunk's gradient arrives back at its home device
    with contributions from every q shard.  p is recomputed as
    exp(s - lse) from the saved statistic — no second softmax reduction.
  * all accumulation in f32; inputs/outputs in the compute dtype (bf16).

The math is collective-count optimal: K/V (+ dk/dv in the backward) each
cross every ICI hop exactly once, the minimum for unmasked full attention.

This module is kernel-agnostic by construction — the per-chunk contraction
is a plain dot_general chain that XLA fuses; at chunk sizes below the flash
kernel's design point that is the measured-best backend anyway
(core/attention.py PALLAS_MIN_SEQ).

The reference has no distributed-attention equivalent (its NCCL layer does
data parallelism only); this is a beyond-parity scaling feature, loss-parity
tested on the virtual CPU mesh (tests/test_ring.py).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from . import mesh as mesh_m
from .mesh import SEQ_AXIS

# Trace-time scope consulted by core.attention.attention() — entered inside
# the task loss_fn around the DiT forward (the int8_training_ctx pattern,
# tasks/video.py), so it is active on every trace/retrace and the jitted
# executable bakes the ring dispatch in.
_SCOPE: contextvars.ContextVar = contextvars.ContextVar("ring_scope",
                                                        default=None)


@contextlib.contextmanager
def ring_scope(mesh: Mesh, axis_name: str = SEQ_AXIS):
    """Route DiT attention through ring_attention for the enclosed trace."""
    tok = _SCOPE.set((mesh, axis_name))
    try:
        yield
    finally:
        _SCOPE.reset(tok)


def active_scope():
    """(mesh, axis_name) when a ring_scope is open and its seq axis is >1."""
    s = _SCOPE.get()
    if s is not None and s[0].shape.get(s[1], 1) > 1:
        return s
    return None


def _rotate(x, axis_name, n):
    """Send this device's chunk to the next device on the ring (i -> i+1)."""
    return jax.lax.ppermute(x, axis_name, [(i, (i + 1) % n) for i in range(n)])


def _scores(q, k_c, scale):
    """[B, Lq, H, D] x [B, Lkv, H, D] -> [B, H, Lq, Lkv] f32."""
    return jnp.einsum("blhd,bmhd->bhlm", q, k_c,
                      preferred_element_type=jnp.float32) * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_shard(axis_name, q, k, v, kvm):
    """Per-shard body (runs inside shard_map): q/k/v [B, L/n, H, D];
    ``kvm`` [Lkv/n] f32 key-validity (1 = real, 0 = pad) — all-ones when L
    divides the axis; pad columns are masked to -inf before the softmax so
    the math on real rows is exactly the unpadded ring."""
    o, _ = _ring_fwd_impl(axis_name, q, k, v, kvm)
    return o


def _mask_scores(s, kvm_c):
    """[B, H, Lq, Lkv] scores with pad-key columns at -inf."""
    return jnp.where(kvm_c[None, None, None, :] > 0, s, -jnp.inf)


def _ring_fwd_impl(axis_name, q, k, v, kvm):
    n = jax.lax.axis_size(axis_name)
    b, lq, h, d = q.shape
    scale = 1.0 / (d ** 0.5)

    def step(i, carry):
        k_c, v_c, kvm_c, o, m, den = carry
        s = _mask_scores(_scores(q, k_c, scale), kvm_c)  # [B, H, Lq, Lkv] f32
        m_c = jnp.max(s, axis=-1, keepdims=True)         # [B, H, Lq, 1]
        m_new = jnp.maximum(m, m_c)
        # m_new == -inf only while every key seen so far is a pad column
        # (a fully-padded chunk before any real one): exp(-inf - -inf) is
        # nan, so gate it — the o/den carries are still zero there and any
        # finite alpha/zero p keeps them zero
        safe = ~jnp.isneginf(m_new)
        alpha = jnp.where(safe, jnp.exp(m - m_new), 1.0)
        p = jnp.where(safe, jnp.exp(s - m_new), 0.0)
        den = den * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhlm,bmhd->bhld", p.astype(v_c.dtype), v_c,
                        preferred_element_type=jnp.float32)
        o = o * alpha + pv
        return (_rotate(k_c, axis_name, n), _rotate(v_c, axis_name, n),
                _rotate(kvm_c, axis_name, n), o, m_new, den)

    # fresh zeros are device-invariant under shard_map's varying-axis typing;
    # mark them varying over every axis the operands vary over (seq, and
    # data when batch-sharded) so the fori carry types match
    vary = lambda x: jax.lax.pcast(x, tuple(jax.typeof(q).vma), to="varying")
    o0 = vary(jnp.zeros((b, h, lq, d), jnp.float32))
    m0 = vary(jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32))
    den0 = vary(jnp.zeros((b, h, lq, 1), jnp.float32))
    # n steps: the final rotation returns K/V to their home devices (a spare
    # hop, but it keeps the carry uniform and matches the backward's schedule)
    _, _, _, o, m, den = jax.lax.fori_loop(0, n, step,
                                           (k, v, kvm, o0, m0, den0))
    o = (o / den).transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Lq, H, D]
    lse = m + jnp.log(den)                               # [B, H, Lq, 1] f32
    return o, lse


def _ring_vjp_fwd(axis_name, q, k, v, kvm):
    o, lse = _ring_fwd_impl(axis_name, q, k, v, kvm)
    return o, (q, k, v, kvm, o, lse)


def _ring_vjp_bwd(axis_name, res, do):
    q, k, v, kvm, o, lse = res
    n = jax.lax.axis_size(axis_name)
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    do_f = do.astype(jnp.float32)
    # D_i = sum(do * o) per row: [B, H, Lq, 1]
    d_i = jnp.einsum("blhd,blhd->bhl", do_f, o.astype(jnp.float32)
                     )[..., None]

    def step(i, carry):
        k_c, v_c, kvm_c, dk_c, dv_c, dq = carry
        s = _mask_scores(_scores(q, k_c, scale), kvm_c)  # [B, H, Lq, Lkv] f32
        # every q row attends >= 1 real key (the pad is key-side only), so
        # lse is finite and exp(-inf - lse) cleanly zeroes pad columns
        p = jnp.exp(s - lse)
        dp = jnp.einsum("blhd,bmhd->bhlm", do, v_c,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - d_i)                              # f32
        dsb = ds.astype(k_c.dtype)
        pb = p.astype(do.dtype)
        dq = dq + jnp.einsum("bhlm,bmhd->bhld", dsb, k_c,
                             preferred_element_type=jnp.float32) * scale
        dk_c = dk_c + jnp.einsum("bhlm,blhd->bhmd", dsb, q,
                                 preferred_element_type=jnp.float32) * scale
        dv_c = dv_c + jnp.einsum("bhlm,blhd->bhmd", pb, do,
                                 preferred_element_type=jnp.float32)
        # dk/dv accumulators travel with their chunk: after n rotations each
        # is back home having collected every q shard's contribution
        return (_rotate(k_c, axis_name, n), _rotate(v_c, axis_name, n),
                _rotate(kvm_c, axis_name, n),
                _rotate(dk_c, axis_name, n), _rotate(dv_c, axis_name, n), dq)

    b, lq, h, _ = q.shape
    vary = lambda x: jax.lax.pcast(x, tuple(jax.typeof(q).vma), to="varying")
    zkv = vary(jnp.zeros((b, h, lq, d), jnp.float32))
    _, _, _, dk, dv, dq = jax.lax.fori_loop(
        0, n, step, (k, v, kvm, zkv, zkv, zkv))
    tr = lambda x, like: x.transpose(0, 2, 1, 3).astype(like.dtype)
    # kvm is a validity constant, not a differentiable input
    return (tr(dq, q), tr(dk, k), tr(dv, v), jnp.zeros_like(kvm))


_ring_shard.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention(q, k, v, mesh: Mesh, *, axis_name: str = SEQ_AXIS,
                   batch_axis: str | None = mesh_m.DATA_AXIS):
    """Exact unmasked softmax attention with L sharded over ``axis_name``.

    q, k, v: [B, L, H, D] global arrays (B shardable over ``batch_axis``,
    L over ``axis_name``); returns [B, L, H, D] with the same layout.
    Semantically identical to core.attention.sdpa — use when one device's
    HBM cannot hold K/V (+ flash residuals) for the full L.
    """
    n = mesh.shape[axis_name]
    l = q.shape[1]
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        raise ValueError(
            f"ring_attention: B={q.shape[0]} not divisible by mesh axis "
            f"'{batch_axis}' of size {mesh.shape[batch_axis]}")
    # L need not divide the axis: pad the token dim and mask the pad KEYS to
    # -inf inside the ring (image-task joint sequences are odd — 1 class +
    # 196 img tokens at 224px — so requiring divisibility would make SP
    # unusable there).  Pad q rows compute garbage that the final slice
    # drops; the slice/pad VJPs route gradients correctly.
    pad = (-l) % n
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    kvm = (jnp.arange(l + pad) < l).astype(jnp.float32)  # key validity
    spec = P(batch_axis, axis_name, None, None)
    f = jax.shard_map(functools.partial(_ring_shard, axis_name),
                      mesh=mesh, in_specs=(spec, spec, spec, P(axis_name)),
                      out_specs=spec)
    out = f(q, k, v, kvm)
    return out[:, :l] if pad else out
