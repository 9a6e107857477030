"""Config system: reference config.yaml schema loads with OmegaConf-equivalent
behaviour (attribute access, hasattr probing, 1e-4 float coercion)."""

import os
import textwrap

from mde_tpu.core import config as config_lib

REFERENCE_YAML = textwrap.dedent(
    """
    paths:
      usr_name: hailuo
      data_dir: /cluster/courses/cil/monocular_depth/data
      results_dir: results
      predictions_dir: predictions
    experiment:
      model_name: midas_semantics_cross_attention_no_lb
      wandb_disable: False
    augmentation: False
    training:
      n_epoch: 10
      batch_size: 4
      resume_training:
        resume: True
        resume_from_epoch: 7
        run_id: 7iju0bam
      early_stopping:
        patience: 3
        min_delta: 1e-4
    model:
      model_type: MiDaS_small
      dinov2_type: dinov2_vits14
      network:
        use_lb: False
        use_dgr: False
      use_lb: False
      use_dgr: False
      loss_function:
        si_loss_alpha: 1
        silog_loss:
          alpha: 0
          variance_focus: 0.85
        grad_loss_alpha: 0
        edge_loss_alpha: 0
    opt:
      evaluate_best_model: false
    """
)


def test_reference_schema_roundtrip(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = config_lib.load(str(p))
    assert cfg.paths.usr_name == "hailuo"
    assert cfg.training.batch_size == 4
    assert cfg.training.resume_training.resume is True
    assert cfg.training.resume_training.run_id == "7iju0bam"
    assert cfg.model.loss_function.silog_loss.variance_focus == 0.85
    assert cfg.model.dinov2_type == "dinov2_vits14"
    # hasattr probing as used at src/main.py:434
    assert hasattr(cfg.training, "resume_training")
    assert not hasattr(cfg.training, "nonexistent_key")


def test_scientific_notation_coerced(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = config_lib.load(str(p))
    md = cfg.training.early_stopping.min_delta
    assert isinstance(md, float) and md == 1e-4
    # arithmetic must work (src/main.py:201: val < best - min_delta)
    assert 1.0 - md < 1.0


def test_defaults_cover_framework_constants():
    cfg = config_lib.defaults()
    assert cfg.framework.learning_rate == 1e-4
    assert cfg.framework.weight_decay == 1e-4
    assert list(cfg.framework.input_size) == [448, 576]
    assert list(cfg.framework.native_size) == [426, 560]
    assert cfg.framework.seed == 0


def test_merge_and_save(tmp_path):
    cfg = config_lib.defaults()
    cfg.merge_from({"training": {"batch_size": 16}})
    assert cfg.training.batch_size == 16
    assert cfg.training.n_epoch == 10  # untouched sibling survives
    out = tmp_path / "saved.yaml"
    config_lib.save(cfg, str(out))
    again = config_lib.load(str(out))
    assert again.training.batch_size == 16


def test_compilation_cache_enable(tmp_path, monkeypatch):
    """framework.compilation_cache wiring: honors the disable flag, the
    explicit dir, and is idempotent (measured through axon: 3.51s -> 0.03s
    second-process compile; see core/compilation_cache.py)."""
    import jax

    from mde_tpu.core import compilation_cache as cc

    monkeypatch.setattr(cc, "_ENABLED_DIR", None)
    cfg = config_lib.defaults()
    cfg.framework.compilation_cache = False
    assert cc.enable(cfg) is None  # disabled: no-op

    cfg.framework.compilation_cache = True
    cfg.framework.compilation_cache_dir = str(tmp_path / "xla")
    path = cc.enable(cfg)
    assert path == str(tmp_path / "xla")
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path
    assert jax.config.jax_enable_compilation_cache is True
    # idempotent: a second enable with a different dir keeps the first
    assert cc.enable(None, dir_path=str(tmp_path / "other")) == path
