"""Pallas kernels under SPMD partitioning (VERDICT r2 missing #3).

Before core/pallas/spmd.py, a mesh-partitioned caller of the Pallas attention
kernels got the operands all-gathered to every device (12 all-gathers measured
in the compiled HLO of one flash call on an 8-device mesh) because XLA cannot
see into a custom call.  These tests pin the fix: with custom_partitioning
annotations, (a) the compiled HLO of a sharded call contains NO all-gather,
and (b) outputs/gradients under dp2 and dp2×tp2(head) sharding match the
single-device XLA reference with the kernel engaged (interpret mode).
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genhancer_tpu.core.attention import sdpa_xla
from genhancer_tpu.core.pallas import flash_attention as fa_m
from genhancer_tpu.core.pallas import short_attention as sa_m
from genhancer_tpu.core.rope import apply_rope, multi_axis_rope


@pytest.fixture(autouse=True)
def engage_interpret(monkeypatch):
    monkeypatch.setattr(fa_m, "_INTERPRET", True)
    monkeypatch.setattr(sa_m, "_INTERPRET", True)


def _qkv(rng, B=4, L=320, H=4, D=32):
    return tuple(jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
                 for _ in range(3))


def _mesh_dp(n=2):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _mesh_dptp():
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))


class TestFlashSPMD:
    def test_dp_no_allgather_and_parity(self, rng):
        q, k, v = _qkv(rng)
        mesh = _mesh_dp()
        sh = NamedSharding(mesh, P("data"))
        f = jax.jit(lambda a, b, c: fa_m.flash_attention(a, b, c, 64),
                    in_shardings=sh, out_shardings=sh)
        args = [jax.device_put(x, sh) for x in (q, k, v)]
        hlo = f.lower(*args).compile().as_text()
        assert not re.search(r"all-gather", hlo), "kernel forced replication"
        out = f(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa_xla(q, k, v)),
                                   rtol=2e-5, atol=2e-5)

    def test_dp_tp_head_sharded_parity(self, rng):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        q, k, v = _qkv(rng)
        mesh = _mesh_dptp()
        sh = NamedSharding(mesh, P("data", None, "model"))
        f = jax.jit(lambda a, b, c: fa_m.flash_attention(a, b, c, 64),
                    in_shardings=sh, out_shardings=sh)
        args = [jax.device_put(x, sh) for x in (q, k, v)]
        hlo = f.lower(*args).compile().as_text()
        assert not re.search(r"all-gather", hlo)
        out = f(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sdpa_xla(q, k, v)),
                                   rtol=2e-5, atol=2e-5)

    def test_dp_grads_match_single_device(self, rng):
        q, k, v = _qkv(rng, B=2, L=192, H=2, D=16)
        mesh = _mesh_dp()
        sh = NamedSharding(mesh, P("data"))

        def loss(a, b, c):
            return jnp.sum(fa_m.flash_attention(a, b, c, 64) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)), in_shardings=sh)
        args = [jax.device_put(x, sh) for x in (q, k, v)]
        hlo = g.lower(*args).compile().as_text()
        assert not re.search(r"all-gather", hlo), "bwd kernel forced replication"
        got = g(*args)
        ref = jax.grad(lambda a, b, c: jnp.sum(sdpa_xla(a, b, c) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


class TestFusedRopeSPMD:
    def test_dp_parity_with_tables(self, rng):
        B, L, H, D = 4, 64, 4, 16
        q, k, v = _qkv(rng, B, L, H, D)
        ids = jnp.asarray(rng.integers(0, 20, (B, L, 3)).astype(np.float32))
        cos, sin = multi_axis_rope(ids, (D // 2, D // 4, D // 4), 10_000)
        ref = sdpa_xla(apply_rope(q, cos, sin), apply_rope(k, cos, sin), v)
        mesh = _mesh_dp()
        sh = NamedSharding(mesh, P("data"))
        f = jax.jit(sa_m.fused_rope_attention,
                    in_shardings=(sh,) * 5, out_shardings=sh)
        args = [jax.device_put(x, sh) for x in (q, k, v, cos, sin)]
        hlo = f.lower(*args).compile().as_text()
        assert not re.search(r"all-gather", hlo)
        out = f(*args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_norope_dp_grads(self, rng):
        q, k, v = _qkv(rng, B=2, L=48, H=2, D=16)
        mesh = _mesh_dp()
        sh = NamedSharding(mesh, P("data"))

        def loss(a, b, c):
            return jnp.sum(sa_m.fused_attention(a, b, c) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)), in_shardings=sh)
        args = [jax.device_put(x, sh) for x in (q, k, v)]
        got = g(*args)
        ref = jax.grad(lambda a, b, c: jnp.sum(sdpa_xla(a, b, c) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


class TestManualContextDispatch:
    """Inside a shard_map body (e.g. the pipeline stages of parallel/pp.py)
    operands are device-local — custom_partitioning cannot trace there, so
    spmd.wrap's dispatcher must route to the raw kernel on the local shapes
    (and grads must still flow through the custom VJPs).  check_vma=False
    matches the PP usage: interpret-mode Pallas cannot evaluate kernels on
    vma-carrying operands (parallel/pp.py run_phase comment)."""

    def test_flash_inside_shard_map_matches_xla(self, rng):
        q, k, v = _qkv(rng)
        mesh = _mesh_dp()
        f = jax.shard_map(lambda a, b, c: fa_m.flash_attention(a, b, c, 64),
                          mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                          check_vma=False)
        out = jax.jit(f)(q, k, v)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(sdpa_xla(q, k, v)),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_rope_inside_shard_map_grads(self, rng):
        B, L, H, D = 4, 64, 4, 16
        q, k, v = _qkv(rng, B, L, H, D)
        ids = jnp.asarray(rng.integers(0, 20, (B, L, 3)).astype(np.float32))
        cos, sin = multi_axis_rope(ids, (D // 2, D // 4, D // 4), 10_000)
        mesh = _mesh_dp()
        body = jax.shard_map(sa_m.fused_rope_attention, mesh=mesh,
                             in_specs=P("data"), out_specs=P("data"),
                             check_vma=False)

        def loss(a, b, c):
            return jnp.sum(body(a, b, c, cos, sin) ** 2)

        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        ref = jax.grad(
            lambda a, b, c: jnp.sum(sdpa_xla(apply_rope(a, cos, sin),
                                             apply_rope(b, cos, sin), c) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


class TestFsdpAnchor:
    """FSDP x Pallas regression (dryrun failure): with a qkv WEIGHT sharded
    over an 8-way data axis (parallel/fsdp.py), GSPMD may keep the matmul
    output sharded on the weight's axis and the head-split reshape then
    carries a tiling — e.g. 8 = 4(H) x 2(D) — that custom_partitioning's
    NamedSharding conversion rejects ("shape=[1,1,4,2] is incompatible with
    mesh").  core.attention.batch_anchor_scope re-pins attention operands to
    the canonical activation layout; this test drives attention() through
    the fused kernel with a weight-sharded qkv projection and checks parity
    against the unsharded XLA reference.  (The propagation choice is
    cost-based — this minimal graph may compile even unanchored; the
    full-train-step repro is __graft_entry__.dryrun_multichip's FSDP
    segment, which failed without the anchor.)"""

    def test_weight_sharded_qkv_through_kernel(self, rng):
        from genhancer_tpu.core import attention as attn_m
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        B, L, H, D = 8, 64, 4, 16
        h = H * D
        x = jnp.asarray(rng.standard_normal((B, L, h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.05, jnp.float32)
        ids = jnp.asarray(rng.integers(0, 20, (B, L, 3)).astype(np.float32))
        cos, sin = multi_axis_rope(ids, (D // 2, D // 4, D // 4), 10_000)

        def f(x, w, cos, sin):
            qkv = jnp.einsum("blh,oh->blo", x, w)
            q, k, v = (qkv.reshape(B, L, 3, H, D)[:, :, i] for i in range(3))
            return attn_m.attention(q, k, v, cos, sin)

        ref = f(x, w, cos, sin)   # single-logical-device trace

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(w, NamedSharding(mesh, P("data", None)))  # FSDP
        ts = jax.device_put(cos, NamedSharding(mesh, P("data")))
        ss = jax.device_put(sin, NamedSharding(mesh, P("data")))
        with attn_m.batch_anchor_scope(mesh):
            out = jax.jit(f)(xs, ws, ts, ss)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
