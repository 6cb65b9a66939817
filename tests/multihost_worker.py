"""Worker for the multi-host DP test (not a pytest module).

Usage: python multihost_worker.py <proc_id> <nprocs> <port> <outdir>

Each process exposes 4 virtual CPU devices (8 when nprocs == 1), joins a
jax.distributed cluster, builds the flux-debug image stage-1 task, feeds its
*process-local* slice of one deterministic global batch through the same
``shard_batch`` path the trainer uses, and runs 3 steps — with a
checkpoint save + fresh-state resume between steps 2 and 3.  Loss parity of
the 2-process run against the single-process run proves the multi-host input
feeding (``jax.make_array_from_process_local_data``) computes the same global
batch semantics as single-host DP (webdataset ``split_by_node`` equivalence,
SURVEY.md §5.8; VERDICT r1 #3/#6).
"""
import json
import os
import sys

# self-contained import path: the worker is spawned as a bare script in a
# fresh interpreter, so it cannot rely on pytest's rootdir insertion or on
# an editable install being present in the venv
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3], sys.argv[4])
    local_devices = 8 // nprocs
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}").strip()
    os.environ.setdefault("GENHANCER_PALLAS_ATTN", "0")

    if nprocs > 1:
        # production env contract: maybe_initialize_distributed must join the
        # cluster from these envs BEFORE any backend-initializing jax call
        os.environ["GENHANCER_COORDINATOR"] = f"localhost:{port}"
        os.environ["GENHANCER_NUM_PROCS"] = str(nprocs)
        os.environ["GENHANCER_PROC_ID"] = str(proc_id)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from genhancer_tpu.parallel import mesh as _mesh
    _mesh.maybe_initialize_distributed()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    from genhancer_tpu.models import dit as dit_m, vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.parallel import mesh as mesh_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.train import optim, checkpoint as ckpt
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS

    tower_cfg = clip_m.CLIPConfig(
        vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                       num_layers=1, num_heads=2, image_size=28,
                                       patch_size=14),
        text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                                   num_layers=1, num_heads=2, vocab_size=50,
                                   max_position_embeddings=8),
        projection_dim=8)
    spec = image_task.TaskSpec(
        stage="stage1", tower_kind="clip", img_size=32, clip_image_size=28,
        dit_cfg=dit_m.DIT_CONFIGS["flux-debug"],
        vae_cfg=vae_m.VAE_CONFIGS["flux-debug"], tower_cfg=tower_cfg,
        compute_dtype=jnp.float32, dit_param_dtype=jnp.float32)

    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    mesh = mesh_m.make_mesh()
    state = mesh_m.replicate(state, mesh)
    # ZeRO-1 moments sharded over the DP axis — the run must stay loss-equal
    # to the replicated single-process run, and the checkpoint snapshot must
    # gather the shards collectively (async_ckpt.host_snapshot)
    state = state.replace(
        opt_state=mesh_m.shard_over_data(state.opt_state, mesh))
    step_fn = image_task.make_train_step(spec, optimizer)

    os.makedirs(outdir, exist_ok=True)
    global_bs = 8
    global_batch = np.random.default_rng(42).random(
        (global_bs, 32, 32, 3)).astype(np.float32)
    local = global_batch[mesh_m.host_local_batch_slice(global_bs)]

    losses = []
    for i in range(2):
        batch = mesh_m.shard_batch({"image": local}, mesh)
        state, metrics = step_fn(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))

    # checkpoint round-trip under the multi-process topology: save on host 0,
    # resume into a fresh state everywhere, keep training — parity required
    out = os.path.join(outdir, "ckpt")
    # collective snapshot (gathers the sharded ZeRO-1 moments), then host-0
    # writes — the trainer._checkpoint flow
    from genhancer_tpu.train.async_ckpt import host_snapshot
    snap = host_snapshot(state)
    if proc_id == 0:
        os.makedirs(out, exist_ok=True)
        ckpt.save_stage1(snap, out, 2, "image")
    if nprocs > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("ckpt-written")

    fresh = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    fresh = ckpt.resume_latest(fresh, out, "image")
    fresh = mesh_m.replicate(fresh, mesh)
    batch = mesh_m.shard_batch({"image": local}, mesh)
    fresh, metrics = step_fn(fresh, batch, jax.random.key(2))
    losses.append(float(metrics["loss"]))

    # orbax backend round-trip under the SAME multi-process topology: a
    # fully collective sharded save (every host writes its own ZeRO-1 moment
    # shards, no gather) and a restore landing on the live shardings —
    # bit parity with the in-memory state (train/orbax_ckpt.py, VERDICT #7)
    from genhancer_tpu.train import orbax_ckpt
    orbax_ckpt.save_sharded(state, outdir, 99)
    other = image_task.create_task_state(jax.random.key(1), spec, optimizer)
    other = mesh_m.replicate(other, mesh)
    other = other.replace(
        opt_state=mesh_m.shard_over_data(other.opt_state, mesh))
    restored = orbax_ckpt.restore_sharded(other, outdir, 99)
    from jax.experimental import multihost_utils as mh

    def fetch(x):
        # live ZeRO-1 state: GSPMD propagates the data-sharded moment layout
        # into the updated params, so trainable leaves may be data-sharded
        # after step 1 — a direct device_get spans non-addressable devices
        # under >1 process; gather collectively instead
        return np.asarray(mh.process_allgather(x, tiled=True)).astype(np.float32)

    for k in state.trainable:
        a = fetch(restored.trainable[k])
        b = fetch(state.trainable[k])
        assert np.array_equal(a, b), f"orbax trainable mismatch at {k}"
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
        assert np.array_equal(fetch(a), fetch(b)), "orbax opt_state mismatch"

    # FSDP / ZeRO-3 under the SAME multi-process topology: every param leaf
    # sharded over the (cross-host) data axis, moments placed like params —
    # losses must match the replicated run's first two steps exactly
    # (parallel/fsdp.py; min_size=0 so the tiny test leaves actually shard)
    import dataclasses
    from genhancer_tpu.parallel import fsdp as fsdp_m
    from genhancer_tpu.parallel import tp as tp_m
    spec_f = dataclasses.replace(spec, fsdp=True)
    st = image_task.create_task_state(jax.random.key(0), spec_f, optimizer)
    st = mesh_m.replicate(st, mesh)
    trainable, placements = fsdp_m.shard_params_fsdp(st.trainable, mesh,
                                                     min_size=0)
    frozen, _ = fsdp_m.shard_params_fsdp(st.frozen, mesh, min_size=0)
    st = st.replace(trainable=trainable, frozen=frozen,
                    opt_state=tp_m.shard_like_params(st.opt_state, placements,
                                                     mesh))
    step_f = image_task.make_train_step(spec_f, optimizer, mesh=mesh)
    fsdp_losses = []
    for i in range(2):
        batch = mesh_m.shard_batch({"image": local}, mesh)
        st, metrics = step_f(st, batch, jax.random.key(i))
        fsdp_losses.append(float(metrics["loss"]))

    with open(os.path.join(outdir, f"result.{nprocs}proc.{proc_id}.json"), "w") as f:
        json.dump({"losses": losses, "step": int(fresh.step),
                   "fsdp_losses": fsdp_losses}, f)
    print("OK", proc_id, losses, fsdp_losses)


if __name__ == "__main__":
    main()
