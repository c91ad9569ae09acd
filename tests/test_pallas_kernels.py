"""Pallas fused-head kernel: bit-exactness vs the engine sim (and thereby
the C++ engine). Runs in interpreter mode on CPU; the TPU-compiled path is
exercised by bench.py on hardware."""

import numpy as np
import jax.numpy as jnp
import pytest

from nnue_vision_tpu.ops.engine_sim import nnue_engine_forward, nnue_sim_params
from nnue_vision_tpu.ops.pallas_kernels import (
    fused_nnue_head,
    mega_head_params,
    nnue_engine_forward_fused,
    nnue_engine_forward_mega,
    pallas_head_params,
)
from tests.conftest import random_quantized_nnue


@pytest.mark.parametrize("grid,ch,h", [(4, 6, 12), (5, 4, 12)])
def test_fused_forward_matches_engine_sim(rng, grid, ch, h):
    q = random_quantized_nnue(rng, grid=grid, ch=ch, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    imgs = (rng.random((5, h, h, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    ref_logits, ref_density, ref_count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=h, image_w=h
    )
    logits, density, count = nnue_engine_forward_fused(
        params, head, imgs, cfg=cfg, image_h=h, image_w=h, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))


@pytest.mark.parametrize("grid,ch,h,thresh", [
    (4, 6, 12, 0.1),       # n_pad > 0, inactive padding
    (4, 6, 12, -0.25),     # n_pad > 0, ACTIVE padding constant
    (5, 4, 12, 0.1),       # exact-fit grid
])
def test_mega_forward_matches_engine_sim(rng, grid, ch, h, thresh):
    """The single-kernel megafused path (in-kernel quantize + conv-as-
    matmul + head) must be bit-identical to the engine sim — and its
    input is the flat HWC layout the engine CLI reads
    (nnue_inference.cpp:23-30 upstream)."""
    q = random_quantized_nnue(rng, grid=grid, ch=ch, l1=16, l2=8, l3=4,
                              num_classes=3, visual_threshold=thresh)
    params, cfg = nnue_sim_params(q)
    head = mega_head_params(params, cfg, h, h)
    imgs = (rng.random((5, h, h, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    ref_logits, ref_density, ref_count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=h, image_w=h
    )
    logits, density, count = nnue_engine_forward_mega(
        head, jnp.asarray(imgs.reshape(5, -1)), cfg=cfg, image_h=h,
        image_w=h, tile_b=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))
    # non-divisible batch (padding path) + logits-only serving mode
    logits2, d2, c2 = nnue_engine_forward_mega(
        head, jnp.asarray(imgs.reshape(5, -1))[:3], cfg=cfg, image_h=h,
        image_w=h, tile_b=8, interpret=True, with_count=False
    )
    assert d2 is None and c2 is None
    np.testing.assert_array_equal(
        np.asarray(logits2), np.asarray(ref_logits)[:3]
    )


@pytest.mark.parametrize("h,w,grid,ch", [
    (12, 12, 4, 4),   # stride 3, exact fit
    (16, 16, 4, 6),   # stride 5
    (32, 32, 10, 8),  # flagship geometry
    (20, 12, 4, 4),   # non-square image
])
def test_conv_as_matrix_equals_int_conv(rng, h, w, grid, ch):
    """The lifted (H·W·3, FR) conv matrix must reproduce the engine's
    strided 3×3 pad-1 conv accumulator exactly for any geometry —
    pure-matmul check, no Pallas involved."""
    import jax.numpy as jnp

    from nnue_vision_tpu.ops.engine_sim import (
        _int_conv3x3, _quantize_input, engine_conv_stride,
    )
    from nnue_vision_tpu.ops.pallas_kernels import conv_as_matrix

    conv_w = rng.integers(-127, 128, (ch, 3, 3, 3)).astype(np.float32)
    conv_b = rng.integers(-500, 500, (ch,)).astype(np.float32)
    stride = engine_conv_stride(h, grid)
    imgs = (rng.random((3, h, w, 3), dtype=np.float32) * 2 - 1).astype(
        np.float32
    )
    qin = _quantize_input(jnp.asarray(imgs), 64.0)
    acc = np.asarray(_int_conv3x3(
        qin, jnp.asarray(conv_w, jnp.int32), jnp.asarray(conv_b, jnp.int32),
        stride,
    ))
    wfull, bias_row = conv_as_matrix(conv_w, conv_b, h, w, stride)
    qflat = np.asarray(qin, np.float32).reshape(3, -1)
    lifted = qflat @ wfull + bias_row
    np.testing.assert_array_equal(lifted, acc.reshape(3, -1).astype(np.float32))


def test_megafused_qbf16_input_mode_bit_exact(rng):
    """input_mode="qbf16" (host pre-quantized bf16 images, half the HBM
    read) must produce identical bits to the f32 input mode."""
    from nnue_vision_tpu.ops.pallas_kernels import quantize_images_for_mega

    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    head = mega_head_params(params, cfg, 12, 12)
    imgs = (rng.random((4, 12, 12, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    ).reshape(4, -1)
    ref, _, ref_count = nnue_engine_forward_mega(
        head, jnp.asarray(imgs), cfg=cfg, image_h=12, image_w=12,
        tile_b=8, interpret=True
    )
    qimgs = quantize_images_for_mega(imgs, cfg)
    out, _, count = nnue_engine_forward_mega(
        head, jnp.asarray(qimgs), cfg=cfg, image_h=12, image_w=12,
        tile_b=8, interpret=True, input_mode="qbf16"
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))


def test_fused_forward_negative_threshold_activates_padding(rng):
    """grid² · ch exceeds the conv output here, so the trailing features are
    the constant 0; with a negative threshold the engine counts them active
    and adds their FT rows. The kernel folds that in as a precomputed
    constant — must stay bit-identical (nnue_engine.h:246 upstream)."""
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4,
                              num_classes=3, visual_threshold=-0.25)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    imgs = (rng.random((4, 12, 12, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    ref_logits, _, ref_count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=12, image_w=12
    )
    # sanity: padding really exists and really activates
    assert int(np.asarray(ref_count).min()) >= cfg.grid_size  # pad active
    logits, _, count = nnue_engine_forward_fused(
        params, head, imgs, cfg=cfg, image_h=12, image_w=12, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))


def test_large_ft_weights_fall_back_to_f32(rng):
    """.nnue carries int16 FT weights; values beyond the bf16-exact window
    must keep a full-precision table (and stay bit-exact)."""
    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    q.ft.weight[:] = rng.integers(-30000, 30000, q.ft.weight.shape)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    assert head["ft_w"].dtype == jnp.float32
    imgs = (rng.random((3, 12, 12, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    ref_logits, _, _ = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=12, image_w=12
    )
    logits, _, _ = nnue_engine_forward_fused(
        params, head, imgs, cfg=cfg, image_h=12, image_w=12, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))


def test_small_ft_weights_use_bf16_table(rng):
    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, _ = nnue_sim_params(q)
    head = pallas_head_params(params)
    assert head["ft_w"].dtype == jnp.bfloat16  # int8-range values are exact


def test_fused_head_batch_padding(rng):
    """Batch sizes that don't divide the tile must round-trip unpadded."""
    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    buf = rng.integers(-127, 128, (3, q.num_features)).astype(np.float32)
    logits, count = fused_nnue_head(
        head, jnp.asarray(buf), cfg=cfg, tile_b=8, interpret=True
    )
    assert logits.shape == (3, 3)
    assert count.shape == (3,)
    # count equals the direct mask popcount
    expected = (buf > q.visual_threshold).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(count), expected)


def test_logits_only_serving_path(rng):
    """with_count=False must produce the same logits with no count output."""
    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    imgs = (rng.random((5, 12, 12, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    full, _, _ = nnue_engine_forward_fused(
        params, head, imgs, cfg=cfg, image_h=12, image_w=12, interpret=True
    )
    lo, density, count = nnue_engine_forward_fused(
        params, head, imgs, cfg=cfg, image_h=12, image_w=12, interpret=True,
        with_count=False,
    )
    assert density is None and count is None
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(full))
