"""Fused Pallas photometric chain: parity with the unfused jnp ops.

The medium/heavy photometric blocks run as ONE Pallas kernel on TPU
(ops/photometric_kernel.py). The distribution contract (ADVICE r4 / the
golden-pin rationale in test_augment_golden.py): every random draw is
made OUTSIDE the kernel by the same ``_draw`` helpers (same keys, same
shapes) the unfused chain uses, so both paths sample the identical
augmentation distribution; in-kernel arithmetic follows the same
operation order, so outputs agree to f32 ulp — exactly, except the 3x3
blur, whose separable accumulation order differs from XLA's conv window
reduction.

These tests force ``set_photometric_impl("pallas")`` (interpret mode on
CPU) against the default jnp chain. Upstream analogue: none — the
reference augments per sample on the host (data/datasets.py:173-374);
this kernel is the TPU-native equivalent's fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nnue_vision_tpu.data.augment as A
from nnue_vision_tpu.ops.photometric_kernel import (
    HEAVY_F,
    HEAVY_I,
    MEDIUM_F,
    MEDIUM_I,
    photometric_block,
    photometric_ok,
)


@pytest.fixture(autouse=True)
def _reset_impl():
    yield
    A.set_photometric_impl("auto")


def _images(b=16, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, size, size, 3)).astype(np.float32))


@pytest.mark.parametrize("tier", ["medium", "heavy"])
@pytest.mark.parametrize("seed", [0, 3, 11])
def test_fused_matches_unfused_chain(tier, seed):
    """End-to-end augment_batch: forced-pallas vs the jnp chain. Agreement
    to f32 ulp on every op (the blur's reduction-order difference is the
    only non-bit-exact piece); the tight atol also proves the two paths
    drew the SAME random stream — a single diverged gate or parameter
    would produce O(0.1) differences."""
    x = _images(seed=seed + 100)
    k = jax.random.PRNGKey(seed)
    A.set_photometric_impl("xla")
    ref = np.asarray(A.augment_batch(k, x, strength=tier))
    A.set_photometric_impl("pallas")
    out = np.asarray(A.augment_batch(k, x, strength=tier))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=0)


def test_fused_identity_when_all_gates_off():
    """All gates 0 → the kernel is an exact pass-through (bit-equal)."""
    x = _images(b=8, size=16)
    nz = jnp.zeros_like(x)
    for variant, nf, ni in (
        ("medium", MEDIUM_F, MEDIUM_I),
        ("heavy_extra", HEAVY_F, HEAVY_I),
    ):
        fp = jnp.zeros((8, nf), jnp.float32)
        ip = jnp.zeros((8, ni), jnp.int32)
        out = photometric_block(
            x, nz, fp, ip, variant=variant, interpret=True
        )
        assert np.array_equal(np.asarray(out), np.asarray(x)), variant


def test_fused_param_level_parity_blur_off():
    """With the blur gate forced off every remaining op is the same f32
    expression in the same order — agreement with the unfused chain
    applied to the same drawn parameters is to a few f32 ulp (FMA
    contraction is compiler discretion, so cross-compilation-mode
    bit-exactness is not a sound claim; the gates here are drawn at
    p=0.9 so nearly every op actually fires)."""
    b, size = 16, 32
    x = _images(b=b, size=size, seed=5)
    key = jax.random.PRNGKey(42)
    ks = list(jax.random.split(key, 24))

    # draw exactly as _photometric_medium_fused does
    bc_a, bright, contr = A._bc_draw(ks[4], b, 0.9, 0.2)
    h1_a, hue1, sat1, val1 = A._hsv_draw(ks[5], b, 0.9, 10 / 255.0, 0.15, 10 / 255.0)
    nz_a, sigma, noise = A._noise_draw(ks[7], b, x.shape, 0.9, (0.01, 0.05))
    ct_a, y0, hh, x0, ww = A._cutout_draw(ks[8], b, size, size, 0.9, (0.05, 0.15))
    h2_a, hue2, sat2, val2 = A._hsv_draw(ks[9], b, 0.9, 8 / 255.0, 0.1, 8 / 255.0)
    sh_a, theta, offset, dark = A._shadow_draw(ks[20], b, 0.9)
    fg_a, amount = A._fog_draw(ks[21], b, 0.9)
    po_a = A._bernoulli(ks[22], 0.9, b)
    eq_a = A._bernoulli(ks[23], 0.9, b)

    def f(v):
        return v.reshape(b).astype(jnp.float32)

    zero = jnp.zeros((b,), jnp.float32)  # blur gate off
    fparams = jnp.stack(
        [
            f(bc_a), f(bright), f(contr),
            f(h1_a), f(hue1), f(sat1), f(val1),
            zero,
            f(nz_a), f(sigma),
            f(ct_a),
            f(h2_a), f(hue2), f(sat2), f(val2),
            f(sh_a), f(jnp.cos(theta)), f(jnp.sin(theta)), f(offset), f(dark),
            f(fg_a), f(amount),
            f(po_a), f(eq_a),
        ],
        axis=1,
    )
    iparams = jnp.stack([y0, hh, x0, ww], axis=1).astype(jnp.int32)
    out = photometric_block(
        x, noise, fparams, iparams, variant="medium", interpret=True
    )

    # reference: the unfused ops applied with the SAME drawn parameters
    r = x
    r = jnp.where(bc_a, jnp.clip((r - 0.5) * contr + 0.5 + bright, 0.0, 1.0), r)
    r = A._apply_hsv(r, h1_a, hue1, sat1, val1)
    r = jnp.where(nz_a, jnp.clip(r + noise * sigma, 0.0, 1.0), r)
    r = A._apply_cutout(r, ct_a, y0, hh, x0, ww)
    r = A._apply_hsv(r, h2_a, hue2, sat2, val2)
    r = A._apply_shadow(r, sh_a, theta, offset, dark)
    r = jnp.where(fg_a, r * (1.0 - amount) + amount, r)
    r = jnp.where(po_a, jnp.round(r * 15.0) / 15.0, r)
    lo = r.min(axis=(1, 2, 3), keepdims=True)
    hi = r.max(axis=(1, 2, 3), keepdims=True)
    r = jnp.where(eq_a.reshape(b, 1, 1, 1), (r - lo) / jnp.maximum(hi - lo, 1e-6), r)

    np.testing.assert_allclose(np.asarray(out), np.asarray(r), atol=1e-6, rtol=0)


def test_shape_gate():
    assert photometric_ok(32, 32, 3)
    assert photometric_ok(16, 16, 3)
    assert not photometric_ok(64, 64, 3)   # 192 lanes > 128
    assert not photometric_ok(32, 32, 4)   # RGB only
    assert not photometric_ok(2, 2, 3)     # blur needs a 3x3 neighborhood


def test_set_photometric_impl_validates():
    with pytest.raises(ValueError):
        A.set_photometric_impl("nope")
    A.set_photometric_impl("auto")


def test_nonqualifying_shape_falls_back():
    """64x64 images exceed the lane budget — forced-pallas must still
    produce the unfused result (the gate falls back, not crash)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((4, 64, 64, 3)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    A.set_photometric_impl("xla")
    ref = np.asarray(A.augment_batch(k, x, strength="medium"))
    A.set_photometric_impl("pallas")
    out = np.asarray(A.augment_batch(k, x, strength="medium"))
    np.testing.assert_array_equal(out, ref)
