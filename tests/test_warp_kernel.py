"""Pallas warp kernel (ops/warp_kernel.py) — correctness vs the matmul
two-pass and the exactness contracts the augmentation tiers rely on.

The kernel is the round-5 fix for the medium/heavy-tier bottleneck: the
composed-geometry warp cost 32 ms per 1024×32×32×3 batch as an XLA
gather and ~6 ms as one-hot matmuls; the Mosaic lane-gather runs it in
~0.3 ms (scripts/profile_heavy_aug.py). These tests pin its math on CPU
(interpret mode) against the independent one-hot-matmul realization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnue_vision_tpu.data import augment as A
from nnue_vision_tpu.ops.warp_kernel import warp_bilinear, warp_coefficients


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _conformal_batch(key, b, h):
    """Compose the heavy tier's geometric draws into per-sample maps."""
    ks = list(jax.random.split(key, 8))
    mv = A._geom_hflip(ks[0], b, 0.5)
    mv = A._mv_compose(mv, A._geom_rot90(ks[1], b, 0.5))
    mv = A._mv_compose(
        mv, A._geom_affine(ks[2], b, 0.3, 25.0, 0.1, (0.85, 1.15), h, h)
    )
    mv = A._mv_compose(
        mv, A._geom_affine(ks[3], b, 0.3, 15.0, 0.1, (0.9, 1.1), h, h)
    )
    return mv


def _matmul_warp(x, mv):
    """The one-hot-matmul two-pass, forced regardless of platform."""
    old = A._WARP_IMPL
    A._WARP_IMPL = "matmul"
    try:
        return A._warp(x, mv)
    finally:
        A._WARP_IMPL = old


def test_matches_matmul_on_conformal_maps(rng):
    b, h = 16, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    for seed in range(3):
        mv = _conformal_batch(jax.random.PRNGKey(seed), b, h)
        want = np.asarray(_matmul_warp(x, mv))
        got = np.asarray(warp_bilinear(x, mv, interpret=True))
        # same decomposition, same f32 arithmetic up to constant folding
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_rot90_exact(rng):
    b, h = 4, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    mats = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.0, 1.0], [-1.0, 0.0]],
        [[-1.0, 0.0], [0.0, -1.0]],
        [[0.0, -1.0], [1.0, 0.0]],
    ]
    for k, m in enumerate(mats):
        mv = (
            jnp.tile(jnp.asarray(m, jnp.float32), (b, 1, 1)),
            jnp.zeros((b, 2), jnp.float32),
        )
        got = np.asarray(warp_bilinear(x, mv, interpret=True))
        want = np.asarray(jnp.rot90(x, k, (1, 2)))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_hflip_exact(rng):
    b, h = 4, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    m = jnp.tile(
        jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float32), (b, 1, 1)
    )
    got = np.asarray(
        warp_bilinear(x, (m, jnp.zeros((b, 2), jnp.float32)), interpret=True)
    )
    np.testing.assert_array_equal(got, np.asarray(x[:, :, ::-1, :]))


def test_integer_translation_exact_and_zero_fill(rng):
    b, h = 3, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    # inverse map src = dst + (5, -7): shifts content by (-5, +7)
    mv = (
        jnp.tile(jnp.eye(2, dtype=jnp.float32), (b, 1, 1)),
        jnp.tile(jnp.asarray([5.0, -7.0], jnp.float32), (b, 1)),
    )
    got = np.asarray(warp_bilinear(x, mv, interpret=True))
    want = np.zeros_like(got)
    want[:, : h - 5, 7:] = np.asarray(x)[:, 5:, : h - 7]
    np.testing.assert_array_equal(got, want)


def test_full_out_of_frame_is_zero(rng):
    b, h = 2, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    mv = (
        jnp.tile(jnp.eye(2, dtype=jnp.float32), (b, 1, 1)),
        jnp.tile(jnp.asarray([100.0, 100.0], jnp.float32), (b, 1)),
    )
    got = np.asarray(warp_bilinear(x, mv, interpret=True))
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_odd_batch_sizes(rng):
    # tile picker must handle batches that don't divide the default tile
    for b in (1, 3, 7):
        x = jnp.asarray(rng.random((b, 32, 32, 3), dtype=np.float32))
        mv = _conformal_batch(jax.random.PRNGKey(b), b, 32)
        got = np.asarray(warp_bilinear(x, mv, interpret=True))
        want = np.asarray(_matmul_warp(x, mv))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_swap_factoring_bounds_pivot(rng):
    """After the axis-swap factoring, |pass-2 lane coefficient| = |m00|
    must stay ≥ ~0.4 for every conformal tier map (the two-pass
    conditioning argument in the _warp docstring)."""
    b, h = 256, 32
    mv = _conformal_batch(jax.random.PRNGKey(9), b, h)
    _, _, coef2 = warp_coefficients(mv[0], mv[1], h, h)
    assert float(jnp.abs(coef2[:, 1]).min()) > 0.35


def test_set_warp_impl_validates():
    with pytest.raises(ValueError):
        A.set_warp_impl("nope")
    A.set_warp_impl("auto")


def test_gather_and_matmul_paths_agree(rng):
    """The two XLA realizations are independent (flat gather vs one-hot
    matmuls) — cross-check them on fractional conformal maps."""
    b, h = 8, 32
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    mv = A._geom_affine(
        jax.random.PRNGKey(1), b, 1.0, 20.0, 0.1, (0.9, 1.1), h, h
    )
    old = A._WARP_IMPL
    try:
        A._WARP_IMPL = "gather"
        via_gather = np.asarray(A._warp(x, mv))
        A._WARP_IMPL = "matmul"
        via_matmul = np.asarray(A._warp(x, mv))
    finally:
        A._WARP_IMPL = old
    # two-pass vs direct bilinear differ for fractional rotations
    # (different but equally valid resampling — measured max ~0.13 at
    # ±20°, concentrated on high-gradient pixels); bound the divergence
    assert np.abs(via_gather - via_matmul).max() < 0.25
    assert np.abs(via_gather - via_matmul).mean() < 0.02
