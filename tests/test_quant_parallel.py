"""The SHIPPED fast stack under multi-chip parallelism (VERDICT r4 missing #1).

``configs/tpu_fast_stage1.yaml`` ships ``dit_quant: int8_full`` +
``fused_optimizer: pallas`` (with fused int8 weight-cache emission) +
``tower_quant/vae_quant: int8``.  Until round 5 that exact combination had
never executed on any mesh.  These tests pin, on the 8-device CPU mesh:

  A. DP8 loss parity vs single-device for the full fast-stack semantics,
     with the optimizer-emitted cache staying == quantize_weight(new W)
     (up to the known ±1-ulp int8 rounding between the Pallas kernel's
     division and XLA's reciprocal-strength-reduced division — a handful of
     borderline cells per million) and replicated over the data axis.
  B. TP2 x int8_full: parity vs single-device AND the qkv/mlp weights stay
     sharded on the model axis after steps (no silent placement drift).
  C. ZeRO-1 (shard_optimizer_state) x fused pallas optimizer: parity AND
     the Adam moments stay sharded over the data axis after steps.

Reference anchor: the reference's production config is multi-GPU
(``Continuous/train_configs/accelerate_config_4gpu.yaml``) — parity means
OUR production (headline-perf) config is the multi-chip-proven one too.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.core.quant import quantize_weight
from genhancer_tpu.models import dit as dit_m, vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

pytestmark = pytest.mark.slow


def fast_spec(stage="stage1"):
    """tpu_fast_stage1.yaml semantics at test scale: hidden 512 so the
    SWITCHBACK_MIN_DIM=512 gate (core.quant), the Pallas-AdamW eligibility
    (cols %128, size >= 64k) and the fused cache emission (rows %32) ALL
    engage exactly as they do on flux-dev."""
    dit_cfg = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                              context_in_dim=32, hidden_size=512,
                              num_heads=4, depth=1, depth_single_blocks=1,
                              axes_dim=(32, 48, 48))
    vae_cfg = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                              z_channels=4)
    tower_cfg = clip_m.CLIPConfig(
        vision=clip_m.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                       num_layers=1, num_heads=2,
                                       image_size=28, patch_size=14),
        text=clip_m.CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_layers=1, num_heads=2, vocab_size=50,
                                   max_position_embeddings=8),
        projection_dim=24)
    return image_task.TaskSpec(
        stage=stage, tower_kind="clip", img_size=32, clip_image_size=28,
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, tower_cfg=tower_cfg,
        clip_dim=24, t5_dim=32, lora_r=2, lora_targets=("q_proj", "v_proj"),
        compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
        tower_quant="int8", vae_quant="int8", vae_quant_min_ch=16,
        dit_quant="int8_full", dit_quant_cache=True)


def make_opt():
    # trainer wiring: fused_optimizer: pallas + emit_quant for dit_quant
    # in (int8, int8_dw, int8_full) — train/trainer.py
    return optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)),
                                fused="pallas", emit_quant=True)


def _run(mesh=None, tp=1, zero1=False, steps=3):
    spec = fast_spec()
    opt = make_opt()
    state = image_task.create_task_state(jax.random.key(0), spec, opt)
    assert state.quant, "fast stack must enable the weight cache"
    if mesh is not None:
        state = mesh_m.replicate(state, mesh)
        if tp > 1:
            from genhancer_tpu.parallel import tp as tp_m
            tp_m.validate_tp(spec.dit_cfg, tp)
            trainable, placements = tp_m.shard_dit_params(state.trainable, mesh)
            state = state.replace(
                trainable=trainable,
                opt_state=tp_m.shard_like_params(state.opt_state,
                                                 placements, mesh))
        if zero1:
            state = state.replace(
                opt_state=mesh_m.shard_over_data(state.opt_state, mesh))
    step = image_task.make_train_step(spec, opt)
    batch = {"image": jnp.asarray(
        np.random.default_rng(3).random((8, 32, 32, 3)), np.float32)}
    if mesh is not None:
        batch = mesh_m.shard_batch(batch, mesh)
    losses = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    return losses, state


def _assert_cache_consistent(state, max_ulp_cells_per_million=8):
    """Optimizer-emitted cache == quantize_weight(current masters) up to a
    handful of ±1 borderline int8 roundings (kernel divides by ws; jitted
    XLA strength-reduces to a reciprocal multiply — same tolerance as
    tests/test_int8_training.py's cached-vs-fresh note)."""
    assert state.quant
    for path, (wq, ws) in state.quant.items():
        wq_ref, ws_ref = quantize_weight(state.trainable[path], axis=0)
        np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_ref[:, 0]),
                                   rtol=1e-6, err_msg=path)
        a, b = np.asarray(wq, np.int32), np.asarray(wq_ref, np.int32)
        diff = np.abs(a - b)
        n_diff = int((diff > 0).sum())
        assert diff.max(initial=0) <= 1, f"{path}: cache off by >1 int8 step"
        budget = max(2, a.size * max_ulp_cells_per_million // 1_000_000)
        assert n_diff <= budget, f"{path}: {n_diff}/{a.size} cells differ"


@pytest.fixture(scope="module")
def single_run():
    return _run(mesh=None)


class TestFastStackDP:
    """A: the literal tpu_fast_stage1 semantics under 8-way DP."""

    def test_dp8_loss_parity_and_cache(self, single_run):
        l_single, _ = single_run
        mesh = mesh_m.make_mesh(8)
        l_dp, st = _run(mesh=mesh)
        # int8 requantization amplifies the DP psum's fp reassociation; the
        # probe measured max |Δ| ≈ 1.1e-3 at loss ~2.2 (scripts/
        # quant_parallel_probe.py)
        np.testing.assert_allclose(l_dp, l_single, rtol=3e-3)
        _assert_cache_consistent(st)
        # the cache must be REPLICATED over the data axis (every chip loads
        # the same int8 weights next forward)
        for path, (wq, ws) in st.quant.items():
            spec = wq.sharding.spec
            assert not any(a is not None for a in spec), (path, spec)

    def test_dp8_trains(self):
        mesh = mesh_m.make_mesh(8)
        losses, _ = _run(mesh=mesh, steps=4)
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses


class TestFastStackTP:
    """B: model_parallel x dit_quant int8_full (VERDICT r4 weak #1)."""

    def test_tp2_loss_parity_and_sharding(self, single_run):
        l_single, _ = single_run
        mesh = mesh_m.make_mesh(8, model_parallel=2)
        l_tp, st = _run(mesh=mesh, tp=2)
        np.testing.assert_allclose(l_tp, l_single, rtol=3e-3)
        # weights must STAY sharded on the model axis after optimizer steps
        qkv = st.trainable["dit.double_blocks.0.img.attn.qkv.weight"]
        assert qkv.sharding.spec[0] == mesh_m.MODEL_AXIS
        proj = st.trainable["dit.double_blocks.0.img.attn.proj.weight"]
        assert proj.sharding.spec[1] == mesh_m.MODEL_AXIS
        _assert_cache_consistent(st)


class TestFastStackFSDP:
    """fsdp x dit_quant (VERDICT r4 weak #1, last cell of the matrix).

    fsdp x dit_quant_CACHE is unreachable from config: factory.py ties
    ``dit_quant_cache`` to ``fused_optimizer: pallas``, which
    ``validate_parallelism`` rejects under fsdp — pinned below.  The
    reachable combination is fsdp x INLINE int8_full (weights all-gathered
    per use, then requantized in the loss ctx), which must match the
    single-device inline numerics."""

    def test_fsdp_cache_combination_rejected_at_config(self):
        from genhancer_tpu.tasks.factory import validate_parallelism
        cfg = Config({"fsdp": True, "fused_optimizer": "pallas",
                      "dit_quant": "int8_full"})
        with pytest.raises(ValueError, match="fsdp requires the default"):
            validate_parallelism(cfg)

    def test_fsdp8_inline_int8_full_loss_parity(self):
        import dataclasses
        from genhancer_tpu.parallel import fsdp as fsdp_m
        from genhancer_tpu.parallel import tp as tp_m

        def run_inline(use_fsdp):
            spec = dataclasses.replace(fast_spec(), dit_quant_cache=False,
                                       fsdp=use_fsdp)
            opt = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
            state = image_task.create_task_state(jax.random.key(0), spec, opt)
            assert not state.quant
            mesh = mesh_m.make_mesh(8)
            if use_fsdp:
                state = mesh_m.replicate(state, mesh)
                trainable, placements = fsdp_m.shard_params_fsdp(
                    state.trainable, mesh, min_size=0)
                frozen, _ = fsdp_m.shard_params_fsdp(state.frozen, mesh,
                                                     min_size=0)
                state = state.replace(
                    trainable=trainable, frozen=frozen,
                    opt_state=tp_m.shard_like_params(state.opt_state,
                                                     placements, mesh))
            step = image_task.make_train_step(
                spec, opt, mesh=mesh if use_fsdp else None)
            batch = {"image": jnp.asarray(
                np.random.default_rng(3).random((8, 32, 32, 3)), np.float32)}
            if use_fsdp:
                batch = mesh_m.shard_batch(batch, mesh)
            losses = []
            for i in range(3):
                state, m = step(state, batch, jax.random.key(i))
                losses.append(float(m["loss"]))
            return losses, state

        l_ref, _ = run_inline(False)
        l_fsdp, st = run_inline(True)
        np.testing.assert_allclose(l_fsdp, l_ref, rtol=3e-3)
        # params actually sharded after steps (ZeRO-3's residency claim)
        qkv = st.trainable["dit.double_blocks.0.img.attn.qkv.weight"]
        assert any(a is not None for a in qkv.sharding.spec), qkv.sharding


class TestFastStackZero1:
    """C: shard_optimizer_state x fused_optimizer pallas (VERDICT r4 weak #1).

    The Pallas update is a custom call without a partitioning rule, so GSPMD
    gathers the sharded moments around the kernel IN-step (a bandwidth cost,
    documented in train/plan.py) — but numerics match and the moments'
    steady-state placement stays sharded, which is ZeRO-1's memory claim."""

    def test_zero1_loss_parity_and_moments_stay_sharded(self, single_run):
        l_single, _ = single_run
        mesh = mesh_m.make_mesh(8)
        l_z, st = _run(mesh=mesh, zero1=True)
        np.testing.assert_allclose(l_z, l_single, rtol=3e-3)
        n = 8
        sharded = 0
        for leaf in jax.tree_util.tree_leaves(st.opt_state):
            if (getattr(leaf, "ndim", 0) >= 1 and leaf.shape
                    and leaf.shape[0] % n == 0 and leaf.size > 1000):
                spec = leaf.sharding.spec
                assert spec and spec[0] == mesh_m.DATA_AXIS, (leaf.shape, spec)
                assert (leaf.sharding.shard_shape(leaf.shape)[0]
                        == leaf.shape[0] // n)
                sharded += 1
        assert sharded > 10
        _assert_cache_consistent(st)
