"""Quantization fidelity: the int8 engine evaluates (close to) the float
model for both families — the core deployment guarantee the reference
lacked."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnue_vision_tpu.models.etinynet import (
    EtinyNetConfig,
    etinynet_apply,
    etinynet_init,
    etinynet_quantize,
)
from nnue_vision_tpu.models.nnue import (
    GridFeatureSet,
    NNUEConfig,
    nnue_apply,
    nnue_init,
    nnue_quantize,
)
from nnue_vision_tpu.ops.engine_sim_np import etiny_forward_np, nnue_forward_np


def test_nnue_qat_float_matches_int8(rng):
    """With representable weights, QAT float forward == int8 engine logits
    up to conv-input truncation effects (small)."""
    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16, qat=True)
    params = {k: np.asarray(v) for k, v in
              nnue_init(jax.random.PRNGKey(0), cfg).items()}
    half = cfg.l1_size // 2
    params["ft_w"] = np.round(params["ft_w"] * 64) / 64
    params["ft_b"] = np.round(params["ft_b"] * 64) / 64
    fc1 = params["fc1_w"].copy()
    fc1[:, :half] = np.round(fc1[:, :half] * 64) / 64
    fc1[:, half:] = np.round(fc1[:, half:] * 32) / 32
    params["fc1_w"] = fc1
    params["fc1_b"] = np.round(params["fc1_b"] * 2048) / 2048
    params["fc2_w"] = np.round(params["fc2_w"] * 64) / 64
    params["fc2_b"] = np.round(params["fc2_b"] * 4096) / 4096
    params["out_w"] = np.round(params["out_w"] * 64) / 64
    params["out_b"] = np.round(params["out_b"] * 4096) / 4096
    pj = {k: jnp.asarray(v) for k, v in params.items()}

    q = nnue_quantize(pj, cfg)
    imgs = rng.random((4, 16, 16, 3), dtype=np.float32).astype(np.float32)
    float_logits = np.asarray(nnue_apply(pj, jnp.asarray(imgs), cfg))
    for i in range(4):
        int_logits, _ = nnue_forward_np(q, imgs[i])
        scale = max(1e-3, float(np.abs(float_logits[i]).max()))
        rel = np.abs(float_logits[i] - int_logits).max() / scale
        assert rel < 0.25, f"sample {i}: relative logit error {rel}"


def test_nnue_threshold_scaling(rng):
    """Serialized threshold is 64× the float threshold (the engine compares
    64-scaled conv integers)."""
    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    q = nnue_quantize(params, cfg)
    assert q.visual_threshold == pytest.approx(
        64.0 * float(np.mean(np.asarray(params["visual_threshold"]))), rel=1e-6
    )


def test_etiny_engine_friendly_agreement(rng):
    """engine_friendly float forward ≈ int8 engine output (sub-percent)."""
    cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32,
                         engine_friendly=True)
    params, stats = etinynet_init(jax.random.PRNGKey(0), cfg)
    for i in range(3):  # populate batch statistics
        x = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
        _, stats = etinynet_apply(params, stats, x, cfg, train=True)

    q = etinynet_quantize(params, stats, cfg)
    imgs = rng.random((4, 32, 32, 3), dtype=np.float32).astype(np.float32)
    fl, _ = etinynet_apply(params, stats, jnp.asarray(imgs), cfg, train=False)
    fl = np.asarray(fl)
    for i in range(4):
        il = etiny_forward_np(q, imgs[i])
        scale = max(1e-3, float(np.abs(fl[i]).max()))
        rel = np.abs(fl[i] - il).max() / scale
        assert rel < 0.1, f"sample {i}: relative logit error {rel}"


def test_nnue_quantize_dequantize_idempotent(rng):
    """quantize → dequantize → quantize reproduces identical integers."""
    from nnue_vision_tpu.models.nnue import nnue_from_quantized

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    q1 = nnue_quantize(params, cfg)
    p2, cfg2 = nnue_from_quantized(q1)
    q2 = nnue_quantize(p2, cfg2)
    for name in ("conv", "ft", "fc1", "fc2", "out"):
        a, b = getattr(q1, name), getattr(q2, name)
        np.testing.assert_array_equal(a.weight, b.weight)
        np.testing.assert_array_equal(a.bias, b.bias)
    assert q2.visual_threshold == pytest.approx(q1.visual_threshold, rel=1e-6)


def test_etiny_faithful_scales_in_file(rng, tmp_path):
    """The serialized scales carry the faithful scheme."""
    cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(0), cfg)
    q = etinynet_quantize(params, stats, cfg)
    assert q.blocks[0].pw_expand_scale == 1024.0
    assert q.blocks[0].dw_scale == 64.0
    assert q.blocks[0].pw_project_scale == 4.0
    assert q.classifier.scale == 1024.0

    from nnue_vision_tpu.formats import read_etiny, write_etiny

    path = tmp_path / "m.etiny"
    write_etiny(q, path)
    q2 = read_etiny(path)
    assert q2.blocks[0].pw_expand_scale == 1024.0
    assert q2.classifier.scale == 1024.0


def test_etiny_lsq_scales_fold_exactly(rng):
    """LSQ per-channel activation scales: the q-mode float forward with
    RANDOM (non-unit) scales must still agree with the int8 engine on the
    serialized file — the folding (conv/s per out-channel, s into the
    consumer's input columns, amplifier eye·64·s3) realizes the same
    function the quantizers trained."""
    import dataclasses

    cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32,
                         engine_friendly=True)
    params, stats = etinynet_init(jax.random.PRNGKey(0), cfg)
    # non-trivial per-channel scales in [0.5, 1.5]
    params = dict(params)
    params["blocks"] = [dict(bp) for bp in params["blocks"]]
    for bp in params["blocks"]:
        bp["qlog1"] = jnp.asarray(
            rng.uniform(-0.7, 0.4, bp["qlog1"].shape).astype(np.float32))
        bp["qlog2"] = jnp.asarray(
            rng.uniform(-0.7, 0.4, bp["qlog2"].shape).astype(np.float32))
    params["final_qlog"] = jnp.asarray(
        rng.uniform(-0.5, 0.4, params["final_qlog"].shape).astype(np.float32))
    for i in range(3):  # populate batch statistics
        x = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
        _, stats = etinynet_apply(params, stats, x, cfg, train=True)

    q = etinynet_quantize(params, stats, cfg)
    imgs = rng.random((4, 32, 32, 3), dtype=np.float32).astype(np.float32)
    fl, _ = etinynet_apply(params, stats, jnp.asarray(imgs), cfg, train=False)
    fl = np.asarray(fl)
    for i in range(4):
        il = etiny_forward_np(q, imgs[i])
        scale = max(1e-3, float(np.abs(fl[i]).max()))
        rel = np.abs(fl[i] - il).max() / scale
        assert rel < 0.1, f"sample {i}: relative logit error {rel}"
