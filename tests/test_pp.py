"""Pipeline-parallel DiT (parallel/pp.py): parity vs the plain forward on
the virtual CPU mesh, full-train-step parity, and validation errors.

The GPipe schedule (stacked stage params sharded over a ``pipe`` mesh axis,
microbatches flowing via ppermute inside a lax.scan) must be semantically
identical to models/dit.py dit_forward — PP is a beyond-parity scaling
feature (the reference's NCCL layer is DP-only, SURVEY.md §2.9/§5.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genhancer_tpu.core.rope import spatial_ids
from genhancer_tpu.models import dit as dit_m
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.parallel import pp as pp_m

# depth 2 + 2: the smallest pp2-able graph (each compile on this 1-CPU
# container costs ~10 s/block; the deeper schedules live in the slow tier)
CFG = dit_m.DiTConfig(in_channels=8, vec_in_dim=12, context_in_dim=16,
                      hidden_size=64, num_heads=4, depth=2,
                      depth_single_blocks=2, axes_dim=(4, 6, 6))


@pytest.fixture(scope="module")
def setup():
    params = dit_m.init_dit(jax.random.key(0), CFG)
    b, l_img = 8, 16
    rng = np.random.default_rng(0)
    batch = dict(
        img=jnp.asarray(rng.standard_normal((b, l_img, CFG.in_channels)),
                        jnp.float32),
        img_ids=jnp.broadcast_to(spatial_ids(4, 4)[None],
                                 (b, l_img, 3)).astype(jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, 3, CFG.context_in_dim)),
                        jnp.float32),
        txt_ids=jnp.zeros((b, 3, 3), jnp.float32),
        timesteps=jnp.full((b,), 0.5, jnp.float32),
        y=jnp.asarray(rng.standard_normal((b, CFG.vec_in_dim)), jnp.float32),
        guidance=jnp.full((b,), 4.0, jnp.float32),
    )
    ref = jax.jit(lambda p: dit_m.dit_forward(p, CFG, **batch))(params)
    return params, batch, ref


def test_pp2_forward_and_grad_parity(setup):
    params, batch, ref = setup
    mesh = mesh_m.make_mesh(8, pipeline_parallel=2)   # dp4 x pp2

    def fwd(p):
        return pp_m.pipeline_dit_forward(p, CFG, mesh=mesh, n_micro=2, **batch)

    out = jax.jit(fwd)(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    gr = jax.jit(jax.grad(lambda p: jnp.mean(
        dit_m.dit_forward(p, CFG, **batch) ** 2)))(params)
    gp = jax.jit(jax.grad(lambda p: jnp.mean(fwd(p) ** 2)))(params)
    err = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), gr, gp)
    assert max(jax.tree.leaves(err)) < 2e-5, err


@pytest.mark.slow
def test_pp4_microbatch_remat_parity(setup):
    # 4 stages x 4 local microbatches, remat on — the deepest schedule the
    # tiny config supports (depth_single_blocks=4); double phase runs pp2.
    params, batch, ref = setup
    cfg4 = dit_m.DiTConfig(in_channels=8, vec_in_dim=12, context_in_dim=16,
                           hidden_size=64, num_heads=4, depth=4,
                           depth_single_blocks=4, axes_dim=(4, 6, 6))
    params4 = dit_m.init_dit(jax.random.key(1), cfg4)
    mesh = mesh_m.make_mesh(8, pipeline_parallel=4)   # dp2 x pp4
    ref4 = jax.jit(lambda p: dit_m.dit_forward(p, cfg4, **batch))(params4)
    out = jax.jit(lambda p: pp_m.pipeline_dit_forward(
        p, cfg4, mesh=mesh, n_micro=4, remat=True, **batch))(params4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref4), atol=2e-5)


def test_pp_validation():
    mesh = mesh_m.make_mesh(8, pipeline_parallel=2)
    with pytest.raises(ValueError, match="composes with data parallelism"):
        mesh_m.make_mesh(8, model_parallel=2, pipeline_parallel=2)
    with pytest.raises(ValueError, match="must divide both depth"):
        pp_m.validate_pp(CFG, 3, 1, 8)
    with pytest.raises(ValueError, match="not divisible by"):
        pp_m.validate_pp(CFG, 2, 3, 8)
    # mesh without a pipe axis fails loudly
    dmesh = mesh_m.make_mesh(8)
    x = jnp.zeros((8, 4, CFG.in_channels))
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        pp_m.pipeline_dit_forward(
            {}, CFG, mesh=dmesh, n_micro=1, img=x,
            img_ids=jnp.zeros((8, 4, 3)), txt=jnp.zeros((8, 2, 16)),
            txt_ids=jnp.zeros((8, 2, 3)), timesteps=jnp.zeros((8,)),
            y=jnp.zeros((8, 12)), guidance=jnp.zeros((8,)))
    # IP-adapter conditioning is unsupported under PP
    with pytest.raises(NotImplementedError, match="IP-adapter"):
        pp_m.pipeline_dit_forward(
            {}, CFG, mesh=mesh, n_micro=1, img=x,
            img_ids=jnp.zeros((8, 4, 3)), txt=jnp.zeros((8, 2, 16)),
            txt_ids=jnp.zeros((8, 2, 3)), timesteps=jnp.zeros((8,)),
            y=jnp.zeros((8, 12)), guidance=jnp.zeros((8,)),
            ip_params={"x": 1})


def test_spec_dispatch_rejects_quant_under_pp():
    from genhancer_tpu.tasks.image import _dit_apply_factory

    class Spec:
        pipeline_parallel = 2
        pipeline_microbatches = 0
        dit_quant = "int8"

    mesh = mesh_m.make_mesh(8, pipeline_parallel=2)
    with pytest.raises(ValueError, match="dit_quant"):
        _dit_apply_factory(Spec(), mesh)
    with pytest.raises(ValueError, match="needs the mesh"):
        _dit_apply_factory(Spec(), None)


@pytest.mark.slow
def test_pp_train_step_loss_parity():
    """Full image stage-1 train step on a dp4 x pp2 mesh matches the dp8-only
    step: same init, same batch, same key -> same loss both steps (the
    second step also exercises apply_gradients + ZeRO-1 moment sharding
    under the pipe mesh)."""
    from genhancer_tpu.models import vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

    dit_cfg = dit_m.DiTConfig(in_channels=64, vec_in_dim=24, context_in_dim=32,
                              hidden_size=64, num_heads=4, depth=2,
                              depth_single_blocks=4, axes_dim=(4, 6, 6))
    vae_cfg = vae_m.VAEConfig(resolution=64, ch=8, ch_mult=(1, 2, 4, 4),
                              num_res_blocks=1, z_channels=16)
    tower_cfg = clip_m.CLIPConfig(
        vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                       num_layers=1, num_heads=2, image_size=64,
                                       patch_size=16),
        text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                   num_layers=1, num_heads=2, vocab_size=50,
                                   max_position_embeddings=8),
        projection_dim=24)

    def build(pp):
        spec = image_task.TaskSpec(
            stage="stage1", tower_kind="clip", img_size=64, clip_image_size=64,
            dit_cfg=dit_cfg, vae_cfg=vae_cfg, tower_cfg=tower_cfg,
            clip_dim=24, t5_dim=32, compute_dtype=jnp.float32,
            dit_param_dtype=jnp.float32, pipeline_parallel=pp,
            pipeline_microbatches=2 if pp > 1 else 0)
        mesh = mesh_m.make_mesh(8, pipeline_parallel=pp)
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        state = mesh_m.replicate(state, mesh)
        if pp > 1:   # ZeRO-1 composes with PP on the data axis
            state = state.replace(
                opt_state=mesh_m.shard_over_data(state.opt_state, mesh))
        step = image_task.make_train_step(spec, optimizer, mesh=mesh)
        batch = mesh_m.shard_batch(
            {"image": np.random.default_rng(0).random((8, 64, 64, 3),
                                                      dtype=np.float32)}, mesh)
        return step, state, batch

    losses = {}
    for pp in (1, 2):
        step, state, batch = build(pp)
        ls = []
        for s in range(2):
            state, metrics = step(state, batch, jax.random.key(5 + s))
            ls.append(float(metrics["loss"]))
        losses[pp] = ls
    assert np.allclose(losses[1], losses[2], atol=1e-5), losses
    assert np.isfinite(losses[2]).all()
