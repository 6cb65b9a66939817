"""Checkpoint manager unit tests: robust resume discovery (quirk Q2),
component loading, optimizer round-trip, HF export."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import checkpoint as C
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.train.state import create_state

from test_train_step import make_image_spec


@pytest.fixture
def state():
    spec = make_image_spec("stage1")
    modules = image_task.init_modules(jax.random.key(0), spec)
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
    return create_state(modules, image_task.trainable_predicate(spec, modules),
                        optimizer), optimizer


class TestLatestStep:
    def test_ignores_non_checkpoint_files(self, tmp_path, state):
        """The reference's int(path.split('-')[1]) crashed on its own
        artifacts (Q2); ours must not."""
        st, _ = state
        C.save_stage1(st, str(tmp_path), 7, "image")
        C.save_stage1(st, str(tmp_path), 12, "image")
        # decoys that broke the reference scan
        open(tmp_path / "checkpoint-project-clip-999.bin", "w").close()
        open(tmp_path / "checkpoint-foo.bin", "w").close()
        (tmp_path / "clip-vit-large-patch14-336-50").mkdir()
        assert C.latest_step(str(tmp_path)) == 12

    def test_empty_dir(self, tmp_path):
        assert C.latest_step(str(tmp_path)) is None
        assert C.latest_step(str(tmp_path / "missing")) is None


class TestRoundTrip:
    def test_optimizer_state_roundtrip(self, tmp_path, state):
        st, _ = state
        # make opt state non-trivial
        import optax
        p = str(tmp_path / "opt.bin")
        C.save_optimizer_state(st, p)
        st2 = C.load_optimizer_state(st, p)
        a = jax.tree_util.tree_leaves(st.opt_state)
        b = jax.tree_util.tree_leaves(st2.opt_state)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_component_load_changes_values(self, tmp_path, state):
        st, optimizer = state
        C.save_stage1(st, str(tmp_path), 3, "image")
        # fresh state with different seed -> different params
        spec = make_image_spec("stage1")
        modules2 = image_task.init_modules(jax.random.key(9), spec)
        st2 = create_state(modules2, image_task.trainable_predicate(spec, modules2),
                           optimizer)
        key = next(k for k in st.trainable
                   if k.startswith("dit.") and k.endswith("qkv.weight"))
        assert not np.array_equal(np.asarray(st2.trainable[key]),
                                  np.asarray(st.trainable[key]))
        st2 = C.load_stage1_components(st2, str(tmp_path), 3, "image")
        np.testing.assert_allclose(np.asarray(st2.trainable[key]),
                                   np.asarray(st.trainable[key]),
                                   rtol=1e-2, atol=1e-2)  # bf16 round trip

    def test_resume_latest_sets_step(self, tmp_path, state):
        st, _ = state
        import dataclasses
        st = C.TrainState(trainable=st.trainable, frozen=st.frozen,
                          opt_state=st.opt_state,
                          step=jnp.asarray(42, jnp.int32))
        C.save_stage1(st, str(tmp_path), 42, "image")
        spec = make_image_spec("stage1")
        modules = image_task.init_modules(jax.random.key(1), spec)
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        fresh = create_state(modules, image_task.trainable_predicate(spec, modules),
                             optimizer)
        resumed = C.resume_latest(fresh, str(tmp_path), "image")
        assert int(resumed.step) == 42

    def test_export_hf_tower_merges_lora(self, tmp_path):
        spec = make_image_spec("stage2_only")
        modules = image_task.init_modules(jax.random.key(0), spec)
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        st = create_state(modules, image_task.trainable_predicate(spec, modules),
                          optimizer)
        out = C.export_hf_tower(st, str(tmp_path / "export"),
                                base_config=spec.tower_cfg.to_hf())
        from genhancer_tpu.weights.torch_io import (load_hf_config,
                                                    load_torch_state_dict)
        sd = load_torch_state_dict(os.path.join(out, "pytorch_model.bin"))
        assert not any("lora" in k for k in sd)
        cfg = load_hf_config(out)
        assert cfg["model_type"] == "clip"


class TestPruning:
    def test_prune_keeps_newest(self, tmp_path, state):
        from genhancer_tpu.train import checkpoint as C2
        st, _ = state
        for s in (1, 2, 3, 4):
            C2.save_stage1(st, str(tmp_path), s, "image")
        pruned = C2.prune_checkpoints(str(tmp_path), 2)
        assert pruned == [1, 2]
        assert C2.all_steps(str(tmp_path)) == [3, 4]
        import os
        assert not os.path.exists(tmp_path / "optimizer-state-1.bin")
        assert os.path.exists(tmp_path / "checkpoint-project-clip-3.bin")

    def test_no_prune_under_limit(self, tmp_path, state):
        from genhancer_tpu.train import checkpoint as C2
        st, _ = state
        C2.save_stage1(st, str(tmp_path), 1, "image")
        assert C2.prune_checkpoints(str(tmp_path), 5) == []


class TestAsyncCheckpointer:
    """Async writer (VERDICT r1 #6): identical artifacts to sync, drained on
    wait/close, writer exceptions surface in the caller."""

    def test_async_matches_sync_artifacts(self, tmp_path, state):
        from genhancer_tpu.train.async_ckpt import AsyncCheckpointer
        st, _ = state
        sync_dir, async_dir = str(tmp_path / "s"), str(tmp_path / "a")
        C.save_stage1(st, sync_dir, 5, "image")

        ck = AsyncCheckpointer(enabled=True)
        ck.save(st, lambda snap: C.save_stage1(snap, async_dir, 5, "image"))
        ck.close()

        names = sorted(os.listdir(sync_dir))
        assert names == sorted(os.listdir(async_dir)) and names
        from genhancer_tpu.weights.torch_io import load_torch_state_dict
        for n in names:
            sa = load_torch_state_dict(os.path.join(sync_dir, n))
            sb = load_torch_state_dict(os.path.join(async_dir, n))
            assert sa.keys() == sb.keys()
            for k in sa:
                np.testing.assert_array_equal(np.asarray(sa[k]), np.asarray(sb[k]))

    def test_bounded_inflight_and_order(self, tmp_path, state):
        """A second save drains the first: writes land in submission order."""
        from genhancer_tpu.train.async_ckpt import AsyncCheckpointer
        st, _ = state
        order = []
        ck = AsyncCheckpointer(enabled=True)
        ck.save(st, lambda _s: order.append(1))
        ck.save(st, lambda _s: order.append(2))
        ck.close()
        assert order == [1, 2]

    def test_writer_exception_surfaces(self, state):
        from genhancer_tpu.train.async_ckpt import AsyncCheckpointer
        st, _ = state

        def boom(_snap):
            raise IOError("disk full")

        ck = AsyncCheckpointer(enabled=True)
        ck.save(st, boom)
        with pytest.raises(IOError, match="disk full"):
            ck.wait()
        ck.close()

    def test_sync_mode_inline(self, state):
        from genhancer_tpu.train.async_ckpt import AsyncCheckpointer
        st, _ = state
        ran = []
        ck = AsyncCheckpointer(enabled=False)
        ck.save(st, lambda _s: ran.append(True))
        assert ran == [True]  # ran before save() returned
        ck.close()
