"""Scaled-dot-product attention for the DiT joint streams.

The reference's hot kernel is cuDNN flash attention behind
``F.scaled_dot_product_attention`` (src/flux/math.py:6-12).  Here:

  * ``sdpa_xla``: einsum attention with float32 softmax — XLA fuses this well
    at the DiT's sequence lengths (<= ~2.4k tokens) and it is the reference
    implementation for tests.
  * ``sdpa`` dispatches to a Pallas flash-attention kernel on TPU when
    available/enabled, else the XLA path.  Both produce [B, L, H*D].

Layout note: activations flow as [B, L, H, D] (lane dim = D = 128 exactly
matches the MXU/VPU lane width for flux-dev head_dim=128).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp

from .rope import apply_rope

_USE_PALLAS = os.environ.get("GENHANCER_PALLAS_ATTN", "auto")

# FSDP activation anchor (trace-time scope, the ring_scope pattern).
# Under ``fsdp: true`` the param leaves are sharded over the ``data`` axis
# (parallel/fsdp.py); GSPMD's propagation pass may keep a matmul OUTPUT
# sharded on the weight's axis instead of gathering the weight, and a later
# head-split reshape then carries a sharding like "split the 8-way data
# axis 4-way over H x 2-way over D" — a tiling NamedSharding cannot express,
# which breaks the Pallas custom_partitioning callbacks (observed:
# "shape=[1,1,4,2] is incompatible with mesh_shape={data:8,model:1}").
# The scope pins attention operands to the canonical activation layout —
# batch over ``data``, heads over ``model`` (local heads under TP), L/D
# replicated — exactly the FSDP semantics (weights gather at use,
# activations stay data-parallel), expressed at the one boundary where a
# kernel needs it.
_ANCHOR_MESH: list = []


@contextlib.contextmanager
def batch_anchor_scope(mesh):
    _ANCHOR_MESH.append(mesh)
    try:
        yield
    finally:
        _ANCHOR_MESH.pop()


def _anchor4(*arrays, tp_heads: bool = True):
    """Constrain rank-4 [B, L, H, D] operands to P(data, None, model, None)
    when an anchor scope is open (no-op otherwise).  ``tp_heads=False``
    keeps heads replicated — the tower encoders' projections are never
    TP-sharded (parallel/tp.py shards DiT paths only), so pinning their
    heads to the model axis would force a slice + all-gather per tower
    attention that buys nothing."""
    if not _ANCHOR_MESH:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    mesh = _ANCHOR_MESH[-1]
    model = (MODEL_AXIS if tp_heads and mesh.shape.get(MODEL_AXIS, 1) > 1
             else None)
    sh = NamedSharding(mesh, P(DATA_AXIS, None, model, None))
    return tuple(jax.lax.with_sharding_constraint(x, sh) for x in arrays)


def _anchor3(*arrays):
    """Rank-3 [B, L, E] RoPE tables: batch over data, rest replicated."""
    if not _ANCHOR_MESH:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS
    sh = NamedSharding(_ANCHOR_MESH[-1], P(DATA_AXIS, None, None))
    return tuple(jax.lax.with_sharding_constraint(x, sh) for x in arrays)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q,k,v: [B, L, H, D] -> [B, L, H, D]; float32 softmax accumulation."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa_xla_qchunk(q: jax.Array, k: jax.Array, v: jax.Array,
                    max_logit_bytes: int = 2 << 30) -> jax.Array:
    """Exact attention scanned over query chunks — the bounded-memory XLA
    fallback for sequences beyond the flash kernel's VMEM design point.
    Never materializes the full [B, H, L, L] logits tensor; peak extra memory
    is one [B, H, chunk, L] f32 tile (<= max_logit_bytes)."""
    b, l, h, d = q.shape
    chunk = 128
    while chunk * 2 <= l and b * h * (chunk * 2) * l * 4 <= max_logit_bytes:
        chunk *= 2
    pad = (-l) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    nc = qp.shape[1] // chunk
    qs = jnp.moveaxis(qp.reshape(b, nc, chunk, h, d), 1, 0)  # [nc, B, c, H, D]

    def body(_, qc):
        return None, sdpa_xla(qc, k, v)

    _, out = jax.lax.scan(body, None, qs)
    out = jnp.moveaxis(out, 0, 1).reshape(b, nc * chunk, h, d)
    return out[:, :l]


def _pallas_available() -> bool:
    if _USE_PALLAS == "0":
        return False
    if os.environ.get("GENHANCER_PALLAS_INTERPRET", "0") == "1":
        return True  # interpret-mode kernels run anywhere (CPU-mesh SPMD tests)
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=1)
def _flash_fn():
    from .pallas.flash_attention import flash_attention
    return flash_attention


@functools.lru_cache(maxsize=1)
def _fused_short_fn():
    from .pallas.short_attention import fused_rope_attention
    return fused_rope_attention


@functools.lru_cache(maxsize=1)
def _fused_norope_fn():
    from .pallas.short_attention import fused_attention
    return fused_attention


# Short sequences use the one-program-per-batch fused RoPE+attention kernel
# (measured: RoPE+attention cost 33 ms of an 89 ms flux-dev forward on the
# XLA path at L=197 — layout copies + f32 logits round trips, not FLOPs).
# 600 covers SigLIP-384 image mode (577 joint tokens; fused 2.98 ms vs XLA
# 6.92 ms measured) while keeping the 729-token SigLIP tower grid on XLA
# (h_blk would drop to 1 and the VMEM estimate is marginal there).
FUSED_MAX_SEQ = int(os.environ.get("GENHANCER_FUSED_ATTN_MAX_SEQ", "600"))


# Above this length the head-batched flash kernel wins (measured on v5e:
# L=729/D=64 flash 1.89 ms vs XLA 2.31 ms; L=2304/D=128 flash 3.79 ms vs XLA
# 16.5 ms, and the flash backward avoids [B, H, L, L] softmax residuals);
# at or below it the fused RoPE+attention kernel covers TPU dispatch.
PALLAS_MIN_SEQ = int(os.environ.get("GENHANCER_PALLAS_MIN_SEQ", "600"))


def _flash_ok(q: jax.Array) -> bool:
    """Static capability check (shape-based, decided at trace time) — replaces
    the former try/except dispatch, which could mask genuine compile failures
    as a silent (and catastrophically slower) XLA fallback."""
    from .pallas.flash_attention import flash_supported
    b, l, h, d = q.shape
    return flash_supported(l, h, d)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, L, H, D] -> [B, L, H, D]."""
    if (_USE_PALLAS != "0" and q.shape[1] >= PALLAS_MIN_SEQ
            and _pallas_available()):
        if _flash_ok(q):
            return _flash_fn()(q, k, v)
        if _USE_PALLAS == "1":
            raise ValueError(
                f"flash kernel VMEM design point exceeded at L={q.shape[1]}, "
                f"D={q.shape[-1]} (GENHANCER_PALLAS_ATTN=1 forbids fallback)")
        # beyond the kernel's design point: bounded-memory exact fallback
        return sdpa_xla_qchunk(q, k, v)
    return sdpa_xla(q, k, v)


def _fused_short_ok(q: jax.Array) -> bool:
    return (_USE_PALLAS != "0" and q.shape[1] <= FUSED_MAX_SEQ
            and q.shape[-1] % 2 == 0 and _pallas_available())


def sdpa_auto(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Unmasked SDPA with the best backend for the shape: the no-rope fused
    Pallas kernel for short sequences on TPU — used by the tower encoders,
    whose small per-head matmuls run at ~33% MFU on the XLA einsum path —
    else the standard dispatch."""
    q, k, v = _anchor4(q, k, v, tp_heads=False)
    if _fused_short_ok(q):
        return _fused_norope_fn()(q, k, v)
    return sdpa(q, k, v)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              cos: jax.Array, sin: jax.Array) -> jax.Array:
    """RoPE + SDPA + head merge — the reference `attention` (src/flux/math.py:6-12).

    q,k,v: [B, L, H, D]; cos/sin: [B, L, D/2].  Returns [B, L, H*D].

    Under an open ``parallel.ring.ring_scope`` (sequence_parallel > 1) the
    softmax runs as ring attention with L sharded over the mesh's seq axis;
    RoPE stays outside the ring (it is per-token, GSPMD shards it), and the
    shard_map boundary anchors the L-sharding that the surrounding per-token
    ops (MLPs, norms, modulation) inherit via propagation.
    """
    from ..parallel import ring as ring_m
    scope = ring_m.active_scope()
    if scope is not None:
        mesh, axis_name = scope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        return _merge_heads(ring_m.ring_attention(q, k, v, mesh,
                                                  axis_name=axis_name))
    q, k, v = _anchor4(q, k, v)
    cos, sin = _anchor3(cos, sin)
    if _fused_short_ok(q):
        return _merge_heads(_fused_short_fn()(q, k, v, cos, sin))
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return _merge_heads(sdpa(q, k, v))
