"""Config-time rejection matrix for invalid parallelism compositions
(factory.validate_parallelism; VERDICT r3 #6).

Every documented-invalid combination must raise at build_spec time — before
any weights load or mesh builds — with the same message the materializing
module (parallel/mesh.py, parallel/fsdp.py, parallel/pp.py) would raise
mid-build; and the planner must never *recommend* an invalid combination.
"""
import pytest

from genhancer_tpu.tasks import factory
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS


def cfg(**over):
    c = dict(TRAIN_DEFAULTS)
    c.update({
        "task": "image_stage1", "tower": "openai_clip",
        "model_name": "flux-debug",   # depth 2 + 4 single blocks
        "data_config": {"train_batch_size": 4, "img_size": 224,
                        "img_dir": "/nonexistent-never-touched"},
        "clip_config": {"clip_image_size": 224, "clip_dim": 768,
                        "t5_dim": 4096},
    })
    c.update(over)
    return Config(c)


VALID = [
    dict(),
    dict(model_parallel=2),
    dict(sequence_parallel=2),
    dict(pipeline_parallel=2),                      # divides depth 2 and 4
    dict(fsdp=True),
    dict(fsdp=True, model_parallel=2),              # 2-D FSDP x TP layout
    dict(model_parallel=2, sequence_parallel=2),    # dp x tp x sp mesh
    dict(fsdp=True, fused_optimizer="chained"),
]

INVALID = [
    (dict(pipeline_parallel=2, model_parallel=2), "composes with data"),
    (dict(pipeline_parallel=2, sequence_parallel=2), "composes with data"),
    (dict(fsdp=True, pipeline_parallel=2), "fsdp does not compose with pipeline"),
    (dict(fsdp=True, sequence_parallel=2), "fsdp does not compose with sequence"),
    (dict(fsdp=True, fused_optimizer="pallas"), "fsdp requires the default"),
    (dict(pipeline_parallel=4), "must divide"),     # 4 divides 4 but not depth 2
    (dict(pipeline_parallel=3), "must divide"),
]


@pytest.mark.parametrize("knobs", VALID,
                         ids=lambda k: "+".join(sorted(map(str, k))) or "dp")
def test_valid_combos_build(knobs):
    spec, kind, ckpt_kind = factory.build_spec(cfg(**knobs))
    assert ckpt_kind == "image"


@pytest.mark.parametrize("knobs,msg", INVALID,
                         ids=lambda k: ("+".join(sorted(map(str, k)))
                                        if isinstance(k, dict) else ""))
def test_invalid_combos_raise_at_config_time(knobs, msg):
    with pytest.raises(ValueError, match=msg):
        factory.build_spec(cfg(**knobs))


@pytest.mark.parametrize("knobs,msg", INVALID,
                         ids=lambda k: ("+".join(sorted(map(str, k)))
                                        if isinstance(k, dict) else ""))
def test_video_task_rejects_too(knobs, msg):
    with pytest.raises(ValueError, match=msg):
        factory.build_spec(cfg(task="video_middle_stage1", **knobs))


class TestPlannerConsistency:
    def test_plan_rejects_invalid_combo_with_same_message(self):
        from genhancer_tpu.train import plan as plan_m
        with pytest.raises(ValueError, match="fsdp does not compose"):
            plan_m.plan(cfg(fsdp=True, sequence_parallel=2), num_devices=8)

    def test_ladder_never_recommends_fsdp_under_sp(self):
        # an impossible budget forces the full escalation ladder; with SP
        # configured no candidate may carry fsdp=True (the trainer would
        # reject that combination at config time)
        from genhancer_tpu.train import plan as plan_m
        rep = plan_m.plan(cfg(sequence_parallel=2), num_devices=8,
                          hbm_gb=1e-6)
        assert rep["candidates"], "ladder must still enumerate candidates"
        for c in rep["candidates"]:
            assert not c["knobs"]["fsdp"], c["name"]

    def test_ladder_never_recommends_fsdp_with_pallas_optimizer(self):
        from genhancer_tpu.train import plan as plan_m
        rep = plan_m.plan(cfg(fused_optimizer="pallas"), num_devices=8,
                          hbm_gb=1e-6)
        for c in rep["candidates"]:
            assert not c["knobs"]["fsdp"], c["name"]
