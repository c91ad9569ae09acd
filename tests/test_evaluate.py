"""Evaluation module tests: env overrides, failure-repro persistence,
compiled-vs-sim agreement (upstream evaluate.py behaviors, SURVEY.md §2.4,
§5 failure detection)."""

import os
import stat
from pathlib import Path

import jax
import numpy as np
import pytest

from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
from nnue_vision_tpu.training.evaluate import (
    engine_executable,
    evaluate_compiled_model,
    evaluate_int8_sim,
    evaluate_model,
)

CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                 l3_size=4, num_classes=3, input_size=16)


@pytest.fixture(scope="module")
def model_and_data():
    params = nnue_init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    images = rng.random((8, 16, 16, 3), dtype=np.float32).astype(np.float32)
    labels = rng.integers(0, 3, 8).astype(np.int64)
    return params, [(images, labels)]


def test_engine_executable_env_override(monkeypatch, tmp_path):
    fake = tmp_path / "my_engine"
    fake.write_text("")
    monkeypatch.setenv("NNUE_ENGINE_EXEC", str(fake))
    assert engine_executable("nnue") == fake
    monkeypatch.setenv("ETINY_ENGINE_EXEC", str(fake))
    assert engine_executable("etinynet") == fake
    monkeypatch.delenv("NNUE_ENGINE_EXEC")
    assert engine_executable("nnue").name == "nnue_inference"
    with pytest.raises(ValueError):
        engine_executable("resnet")


def test_missing_engine_raises(model_and_data, monkeypatch, tmp_path):
    params, loader = model_and_data
    monkeypatch.setenv("NNUE_ENGINE_EXEC", str(tmp_path / "nope"))
    with pytest.raises(RuntimeError, match="engine not found"):
        evaluate_compiled_model(params, None, loader,
                                model_type="nnue", model_cfg=CFG)


def test_engine_failure_persists_repro(model_and_data, monkeypatch, tmp_path):
    """A failing engine must persist model+image+repro.sh
    (upstream evaluate.py:229-257)."""
    params, loader = model_and_data
    crasher = tmp_path / "crasher.sh"
    crasher.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
    crasher.chmod(crasher.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("NNUE_ENGINE_EXEC", str(crasher))
    monkeypatch.chdir(tmp_path)
    with pytest.raises(RuntimeError, match="rc=3"):
        evaluate_compiled_model(params, None, loader,
                                model_type="nnue", model_cfg=CFG)
    failures = list(Path("logs/compiled_eval_failures").iterdir())
    assert failures, "no repro directory persisted"
    contents = {p.name for p in failures[0].iterdir()}
    assert "repro.sh" in contents
    assert any(n.endswith(".nnue") for n in contents)
    assert any(n.endswith(".bin") for n in contents)


def test_sim_and_engine_agree(model_and_data, engine_build_dir):
    """evaluate_int8_sim and evaluate_compiled_model produce identical
    accuracy metrics (they compute the same logits)."""
    params, loader = model_and_data
    sim = evaluate_int8_sim(params, None, loader, model_type="nnue",
                            model_cfg=CFG)
    compiled = evaluate_compiled_model(params, None, loader,
                                       model_type="nnue", model_cfg=CFG)
    for key in ("acc", "f1", "precision", "recall"):
        assert sim[key] == pytest.approx(compiled[key], abs=1e-12)
    assert sim["latent_density"] == pytest.approx(
        compiled["latent_density"], abs=1e-7
    )


def test_float_eval(model_and_data):
    params, loader = model_and_data
    loss, metrics = evaluate_model(params, None, loader, model_type="nnue",
                                   model_cfg=CFG)
    assert np.isfinite(loss)
    assert 0.0 <= metrics["acc"] <= 1.0


def test_int8_sim_pallas_backend_matches_xla(model_and_data, monkeypatch):
    """use_pallas routes through the fused kernel and must return identical
    metrics to the XLA sim (same bits). Interpret mode on CPU."""
    import functools

    import nnue_vision_tpu.ops.pallas_kernels as pk

    monkeypatch.setattr(
        pk, "nnue_engine_forward_fused",
        functools.partial(pk.nnue_engine_forward_fused, interpret=True),
    )
    params, loader = model_and_data
    a = evaluate_int8_sim(params, None, loader, model_type="nnue",
                          model_cfg=CFG)
    b = evaluate_int8_sim(params, None, loader, model_type="nnue",
                          model_cfg=CFG, use_pallas=True)
    assert a["f1"] == b["f1"] and a["acc"] == b["acc"]
    assert a["latent_density"] == b["latent_density"]


def test_int8_sim_mega_backend_matches_xla(model_and_data):
    """use_pallas="mega" routes through the single-kernel megafused
    pipeline (flat-input conv-as-matmul) and must return identical
    metrics to the XLA sim. Interpret mode is selected automatically on
    CPU inside the mega branch."""
    params, loader = model_and_data
    a = evaluate_int8_sim(params, None, loader, model_type="nnue",
                          model_cfg=CFG)
    b = evaluate_int8_sim(params, None, loader, model_type="nnue",
                          model_cfg=CFG, use_pallas="mega")
    assert a["f1"] == b["f1"] and a["acc"] == b["acc"]
    assert a["latent_density"] == b["latent_density"]


def test_resident_eval_loader_matches_host_path(model_and_data):
    """ResidentEvalLoader (upload-once, slice-on-device) must be
    metric-identical to the per-batch host path for BOTH the float and
    int8-sim evaluators — it exists to remove the per-epoch re-upload
    (the tunneled-backend staging leak), not to change any number."""
    from nnue_vision_tpu.training.evaluate import ResidentEvalLoader

    params, loader = model_and_data
    images, labels = loader[0]

    class _L:  # minimal ArrayLoader shape over the fixture batch
        batch_size = 3
        drop_last = False

        class dataset:
            pass

    host_loader = _L()
    host_loader.dataset.images = images
    host_loader.dataset.labels = labels

    def batches():
        for i in range(0, len(labels), 3):
            yield images[i : i + 3], labels[i : i + 3]

    class _Iter:
        batch_size = 3
        drop_last = False
        dataset = host_loader.dataset

        def __iter__(self):
            return batches()

        def __len__(self):
            return (len(labels) + 2) // 3

    resident = ResidentEvalLoader(host_loader)
    assert len(resident) == len(_Iter())

    loss_h, met_h = evaluate_model(params, None, _Iter(),
                                   model_type="nnue", model_cfg=CFG)
    loss_r, met_r = evaluate_model(params, None, resident,
                                   model_type="nnue", model_cfg=CFG)
    assert np.isclose(loss_h, loss_r, rtol=1e-5)
    assert met_h["f1"] == pytest.approx(met_r["f1"])
    assert met_h["acc"] == pytest.approx(met_r["acc"])

    sim_h = evaluate_int8_sim(params, None, _Iter(),
                              model_type="nnue", model_cfg=CFG)
    sim_r = evaluate_int8_sim(params, None, resident,
                              model_type="nnue", model_cfg=CFG)
    assert sim_h["acc"] == sim_r["acc"]
    assert sim_h["f1"] == sim_r["f1"]
    assert sim_h["latent_density"] == pytest.approx(sim_r["latent_density"])


def test_maybe_resident_gates_each_split_on_its_own_size(model_and_data):
    """The residency byte cap applies per split: a small split wraps, a
    split over the cap is returned untouched (regression: the test split
    used to be gated on the VAL split's size, and a subsetted train view
    on the FULL dataset's size)."""
    from nnue_vision_tpu.training.evaluate import (
        ResidentEvalLoader,
        maybe_resident,
    )

    _, loader = model_and_data
    images, labels = loader[0]

    class _L:
        batch_size = 3
        drop_last = False

        class dataset:
            pass

    small = _L()
    small.dataset.images = images
    small.dataset.labels = labels

    cap = images.nbytes  # exactly at the cap: wraps (<=)
    assert isinstance(maybe_resident(small, cap), ResidentEvalLoader)
    # one byte under the split size: left unwrapped
    assert maybe_resident(small, cap - 1) is small
