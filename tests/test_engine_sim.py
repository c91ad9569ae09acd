"""Cross-checks between the numpy and JAX engine simulations.

Both must agree bit-for-bit with each other on every input (they are
independently written against the same C++ semantics, so agreement is a
strong self-check even without binaries). Binary parity is covered in
test_engine_parity.py.
"""

import numpy as np

from nnue_vision_tpu.formats import read_nnue, write_nnue
from nnue_vision_tpu.ops.engine_sim import (
    engine_conv_stride,
    etiny_engine_forward,
    etiny_sim_params,
    nnue_engine_forward,
    nnue_sim_params,
)
from nnue_vision_tpu.ops.engine_sim_np import (
    conv_stride_for,
    etiny_forward_np,
    nnue_forward_np,
)
from tests.conftest import random_quantized_etiny, random_quantized_nnue


def test_stride_rule():
    # Engine rule ceil((H-1)/(G-1)) — nnue_engine.cpp:667-675.
    assert engine_conv_stride(32, 10) == 4
    assert engine_conv_stride(16, 4) == 5
    assert engine_conv_stride(96, 10) == 11
    assert engine_conv_stride(8, 8) == 1
    assert engine_conv_stride(5, 1) == 5
    for h in (7, 16, 32, 96):
        for g in (1, 2, 4, 10):
            assert engine_conv_stride(h, g) == conv_stride_for(h, g)


def test_nnue_jax_matches_numpy(rng):
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4, num_classes=3)
    params, cfg = nnue_sim_params(q)
    h = 12
    imgs = (rng.random((4, h, h, 3), dtype=np.float32) * 3 - 1).astype(np.float32)
    logits, density, count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=h, image_w=h
    )
    logits, count = np.asarray(logits), np.asarray(count)
    for i in range(4):
        nl, nd = nnue_forward_np(q, imgs[i])
        np.testing.assert_array_equal(logits[i], nl)
        assert np.float32(count[i]) / np.float32(q.num_features) == np.float32(nd)


def test_nnue_scrambled_grid_placement(rng):
    """H=12, grid=5 → stride 3, conv out 4×4 < 5×5: the flat placement into
    the larger grid buffer (engine quirk) must match in both sims."""
    q = random_quantized_nnue(rng, grid=5, ch=4, l1=16, l2=8, l3=4, num_classes=3)
    params, cfg = nnue_sim_params(q)
    h = 12
    assert engine_conv_stride(h, 5) == 3
    imgs = rng.random((2, h, h, 3), dtype=np.float32).astype(np.float32)
    logits, _, count = nnue_engine_forward(params, imgs, cfg=cfg, image_h=h, image_w=h)
    for i in range(2):
        nl, nd = nnue_forward_np(q, imgs[i])
        np.testing.assert_array_equal(np.asarray(logits[i]), nl)


def test_nnue_sim_from_file_roundtrip(rng, tmp_path):
    """Writing then re-reading the file must not change sim output."""
    q = random_quantized_nnue(rng)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    q2 = read_nnue(path)
    img = rng.random((12, 12, 3), dtype=np.float32).astype(np.float32)
    l1, d1 = nnue_forward_np(q, img)
    l2, d2 = nnue_forward_np(q2, img)
    np.testing.assert_array_equal(l1, l2)
    assert d1 == d2


def test_etiny_jax_matches_numpy(rng):
    q = random_quantized_etiny(rng)
    params, cfg = etiny_sim_params(q)
    h = 32
    imgs = rng.random((3, h, h, 3), dtype=np.float32).astype(np.float32)
    logits = np.asarray(
        etiny_engine_forward(params, imgs, cfg=cfg, image_h=h, image_w=h)
    )
    for i in range(3):
        np.testing.assert_array_equal(logits[i], etiny_forward_np(q, imgs[i]))


def test_density_counts_active_mask(rng):
    """All-positive conv output with threshold below range → density 1 is
    impossible in general, but monotonicity in threshold must hold."""
    q = random_quantized_nnue(rng, grid=4, ch=4)
    img = rng.random((16, 16, 3), dtype=np.float32).astype(np.float32)
    _, d_low = nnue_forward_np(q, img)
    import dataclasses

    q_high = dataclasses.replace(q, visual_threshold=120.0)
    _, d_high = nnue_forward_np(q_high, img)
    assert d_high <= d_low


def test_bf16_conv_fast_path_and_guard(rng):
    """conv_mode="bf16" must be bit-exact vs the numpy oracle for in-window
    inputs, and conv_inputs_bf16_safe must REJECT inputs whose quantized
    values exceed the bf16 exact-integer window (256) — including the
    257..512 band where a wrong 9-bit window would wrongly certify."""
    from nnue_vision_tpu.ops.engine_sim import conv_inputs_bf16_safe

    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)

    # In-window data (|qx| < 128 at scale 64): bf16 path == oracle.
    imgs = (rng.random((3, 12, 12, 3), dtype=np.float32) * 2 - 0.7)
    assert conv_inputs_bf16_safe(imgs, cfg.conv_scale)
    logits, _, count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=12, image_w=12, conv_mode="bf16"
    )
    for i in range(imgs.shape[0]):
        ref, ref_density = nnue_forward_np(q, imgs[i])
        np.testing.assert_array_equal(np.asarray(logits[i]), ref)
        assert int(count[i]) == round(ref_density * q.num_features)

    # Out-of-window (including 257..512, where bf16 rounds): guard rejects,
    # and the default f32 path still matches the oracle.
    for scale_up in (6.0, 50.0):  # qx up to ~±480 / ~±4000
        big = imgs * scale_up
        assert not conv_inputs_bf16_safe(big, cfg.conv_scale)
        lo, _, cnt = nnue_engine_forward(
            params, big, cfg=cfg, image_h=12, image_w=12
        )
        for i in range(big.shape[0]):
            ref, ref_density = nnue_forward_np(q, big[i])
            np.testing.assert_array_equal(np.asarray(lo[i]), ref)
            assert int(cnt[i]) == round(ref_density * q.num_features)

    # The window boundary itself: 256 is safe, 257 is not.
    assert conv_inputs_bf16_safe(np.array([4.0]), 64.0)       # qx = 256
    assert not conv_inputs_bf16_safe(np.array([4.02]), 64.0)  # qx = 257
