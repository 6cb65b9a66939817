"""Config system tests: schema defaults, attribute access, reference parity."""
import yaml

from genhancer_tpu.train.config import Config, load_config, save_config


class TestConfig:
    def test_defaults_fill_missing(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("task: image_stage1\nlearning_rate: 2.0e-5\n")
        cfg = load_config(str(p))
        assert cfg.learning_rate == 2e-5
        assert cfg.adam_beta1 == 0.9           # default
        assert cfg.max_grad_norm == 1.0
        assert cfg.lr_scheduler == "constant"

    def test_attribute_and_path_access(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("data_config:\n  train_batch_size: 4\n  img_size: 224\n")
        cfg = load_config(str(p))
        assert cfg.data_config.train_batch_size == 4
        assert cfg.get_path("data_config.img_size") == 224
        assert cfg.get_path("data_config.missing", 7) == 7

    def test_seq_t5_injection_parity(self, tmp_path):
        """train_SigLIP_stage1.py:93 — seq_t5 = 256 if schnell else 512."""
        p = tmp_path / "c.yaml"
        p.write_text("model_name: flux-schnell\nclip_config:\n  clip_dim: 768\n")
        assert load_config(str(p)).clip_config.seq_t5 == 256
        p.write_text("model_name: flux-dev\nclip_config:\n  clip_dim: 768\n")
        assert load_config(str(p)).clip_config.seq_t5 == 512

    def test_reference_yaml_loads(self, tmp_path):
        """A verbatim reference-schema config (SURVEY §2.7) parses with all
        knobs reachable."""
        ref = {
            "model_name": "flux-dev",
            "data_config": {"train_batch_size": 16, "num_workers": 4,
                            "img_size": 384, "img_dir": "/x", "seed": 0,
                            "patch_size": 1},
            "clip_config": {"clip_image_size": 384, "clip_dim": 768,
                            "t5_dim": 4096},
            "report_to": "tensorboard", "scale_factor": 1.0,
            "train_batch_size": 16, "output_dir": "o/",
            "max_train_steps": 100000, "learning_rate": 1e-4,
            "lr_scheduler": "constant", "lr_warmup_steps": 10,
            "adam_beta1": 0.9, "adam_beta2": 0.999,
            "adam_weight_decay": 0.01, "adam_epsilon": 1e-8,
            "max_grad_norm": 1.0, "logging_dir": "logs",
            "mixed_precision": "bf16", "checkpointing_steps": 50000,
            "checkpoints_total_limit": 50,
            "tracker_project_name": "flux-lightweight",
            "resume_from_checkpoint": "latest",
            "gradient_accumulation_steps": 2, "rank": 1,
        }
        p = tmp_path / "ref.yaml"
        p.write_text(yaml.safe_dump(ref))
        cfg = load_config(str(p))
        assert cfg.checkpointing_steps == 50000
        assert cfg.gradient_accumulation_steps == 2

    def test_save_roundtrip(self, tmp_path):
        cfg = Config._wrap({"a": {"b": 1}, "c": [1, 2]})
        p = str(tmp_path / "out.yaml")
        save_config(cfg, p)
        with open(p) as f:
            back = yaml.safe_load(f)
        assert back == {"a": {"b": 1}, "c": [1, 2]}

    def test_shipped_configs_parse_and_map(self):
        """Every configs/*.yaml must load and resolve to a known task."""
        import glob
        from genhancer_tpu.tasks.factory import _VIDEO_MODE
        for path in glob.glob("configs/*.yaml"):
            cfg = load_config(path)
            task = cfg["task"]
            assert task.startswith("image_") or any(
                task.startswith(k) for k in _VIDEO_MODE), (path, task)
            assert "data_config" in cfg and "clip_config" in cfg


def test_cli_entry_points_exit_zero():
    """Console scripts must not leak the metrics dict into the exit status
    (setuptools wraps the entry point in sys.exit(); a truthy dict would make
    every successful run exit 1)."""
    import os
    from genhancer_tpu.cli import train, evaluate, reconstruct
    for mod in (train, evaluate, reconstruct):
        assert hasattr(mod, "cli")
    root = os.path.join(os.path.dirname(__file__), "..", "pyproject.toml")
    toml = open(root).read()
    for script in ("genhancer-train", "genhancer-eval", "genhancer-reconstruct"):
        line = [l for l in toml.splitlines() if l.startswith(script)][0]
        assert line.rstrip().endswith(':cli"'), line
