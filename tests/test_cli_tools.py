"""End-to-end CLI tests: serialize.py round trip, evaluate.py surface,
dataset inspector, example benchmark (upstream
tests/test_augmentation_integration.py-style subprocess coverage where
cheap, in-process where subprocesses would recompile JAX graphs)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_serialize_cli_roundtrip(tmp_path, rng):
    """checkpoint → serialize.py → .nnue file → engine-sim evaluable."""
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
    from nnue_vision_tpu.training.checkpoint import save_checkpoint
    from serialize import serialize_checkpoint

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(ckpt, model_type="nnue", model_config=cfg, params=params,
                    epoch=0, metrics={})

    out = serialize_checkpoint(ckpt, tmp_path / "model.nnue")
    assert out.exists() and out.suffix == ".nnue"

    from nnue_vision_tpu.formats import read_nnue
    from nnue_vision_tpu.ops.engine_sim_np import nnue_forward_np

    q = read_nnue(out)
    assert q.l1 == 16 and q.num_classes == 3
    img = rng.random((16, 16, 3), dtype=np.float32).astype(np.float32)
    logits, density = nnue_forward_np(q, img)
    assert logits.shape == (3,) and np.all(np.isfinite(logits))


def test_serialize_cli_etinynet(tmp_path):
    from nnue_vision_tpu.models.etinynet import (
        EtinyNetConfig,
        etinynet_init,
    )
    from nnue_vision_tpu.training.checkpoint import save_checkpoint
    from serialize import serialize_checkpoint

    cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "etiny.ckpt"
    save_checkpoint(ckpt, model_type="etinynet", model_config=cfg,
                    params=params, batch_stats=stats, epoch=0, metrics={})
    out = serialize_checkpoint(ckpt, tmp_path / "model.etiny")
    assert out.exists()

    from nnue_vision_tpu.formats import read_etiny

    q = read_etiny(out)
    assert q.variant == "micro"
    # synthetic final-conv block appended (see models/etinynet.py)
    assert q.blocks[-1].pw_project_scale == 4.0
    assert q.classifier.scale == 1024.0


def test_serialize_warns_on_non_engine_friendly_etinynet(tmp_path, capsys):
    """Deployment-trap guardrail (VERDICT r3 #5): serializing an EtinyNet
    trained WITHOUT engine_friendly must warn loudly (the .etiny format's
    7-level activations deploy such models at ~0.078 accuracy), citing
    the measured number; --force silences it; engine_friendly checkpoints
    never warn."""
    from nnue_vision_tpu.models.etinynet import EtinyNetConfig, etinynet_init
    from nnue_vision_tpu.training.checkpoint import save_checkpoint
    from serialize import serialize_checkpoint

    def make_ckpt(name, **cfg_kwargs):
        cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32,
                             **cfg_kwargs)
        params, stats = etinynet_init(jax.random.PRNGKey(0), cfg)
        ckpt = tmp_path / name
        save_checkpoint(ckpt, model_type="etinynet", model_config=cfg,
                        params=params, batch_stats=stats, epoch=0, metrics={})
        return ckpt

    trap = make_ckpt("trap.ckpt")  # engine_friendly defaults False
    out = serialize_checkpoint(trap, tmp_path / "trap.etiny")
    assert out.exists()  # still writes — measuring the trap is legitimate
    err = capsys.readouterr().err
    assert "WARNING" in err and "engine_friendly" in err and "0.078" in err

    serialize_checkpoint(trap, tmp_path / "trap2.etiny", force=True)
    assert "WARNING" not in capsys.readouterr().err

    safe = make_ckpt("safe.ckpt", engine_friendly=True)
    serialize_checkpoint(safe, tmp_path / "safe.etiny")
    assert "WARNING" not in capsys.readouterr().err


def test_serialize_detects_model_type(tmp_path):
    from serialize import detect_model_type

    assert detect_model_type({"model_type": "nnue"}) == "nnue"
    assert detect_model_type({"params": {"ft_w": 1, "conv_w": 1}}) == "nnue"
    assert detect_model_type({"params": {"stem_w": 1, "blocks": []}}) == "etinynet"
    with pytest.raises(ValueError):
        detect_model_type({"params": {"mystery": 1}})


def test_nnue_architecture_inference():
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
    from serialize import infer_nnue_config

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 8), l1_size=32, l2_size=8,
                     l3_size=4, num_classes=7, input_size=32)
    params = {k: np.asarray(v) for k, v in
              nnue_init(jax.random.PRNGKey(0), cfg).items()}
    inferred = infer_nnue_config(params)
    assert inferred.feature_set.grid_size == 4
    assert inferred.feature_set.num_features_per_square == 8
    assert inferred.l1_size == 32 and inferred.num_classes == 7


def test_dataset_inspector():
    from nnue_vision_tpu.data.dataset_inspector import inspect_dataset

    report = inspect_dataset("cifar10", split="test", max_samples=32)
    assert report["num_samples"] == 32
    assert report["image_shape"] == (32, 32, 3)
    assert sum(report["class_distribution"].values()) == 32


def test_example_benchmark_surface():
    sys.path.insert(0, str(REPO))
    import run_example_benchmark

    assert hasattr(run_example_benchmark, "main")
    assert hasattr(run_example_benchmark, "create_example_model")
    model = run_example_benchmark.create_example_model()
    assert model.count_parameters() > 0


def test_mcu_benchmark_script_surface():
    sys.path.insert(0, str(REPO / "scripts"))
    import run_mcu_benchmarks

    assert hasattr(run_mcu_benchmarks, "main")
    assert hasattr(run_mcu_benchmarks, "parse_arguments")
    assert hasattr(run_mcu_benchmarks, "load_model")
    args = run_mcu_benchmarks.parse_arguments(["--max-samples", "8"])
    assert args.max_samples == 8
