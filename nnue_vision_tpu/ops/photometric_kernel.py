"""Pallas fused photometric chain: one kernel per augmentation block.

After the composed-geometry warp (ops/warp_kernel.py) the medium/heavy
augmentation tiers apply ~10-16 gated photometric ops — brightness/
contrast, HSV jitter, blur, gaussian noise, cutout, shadow, fog,
posterize, equalize (data/augment.py; upstream albumentations chain,
reference data/datasets.py:173-374). Each op is one full-batch XLA pass
(25 MB read+write at 1024x32x32x3) because every `jnp.where` blend
materializes both branches; measured together they are ~1.3 ms of the
3.9 ms EtinyNet production step and ~1.0 ms of the NNUE medium-tier step
(docs/TRAIN_ROOFLINE.md round 5, finding 3).

This module collapses one whole photometric block into ONE Pallas kernel:
x and the pre-drawn unit-normal noise tensor stream through VMEM once,
~60 VPU ops apply in-register, and one result writes back — 3 HBM passes
instead of ~32.

Distribution preservation (the ADVICE-r4 constraint): ALL randomness
stays OUTSIDE the kernel. data/augment.py draws every gate/parameter/
noise tensor with exactly the same `jax.random` calls (same keys, same
shapes) as the unfused ops and passes them in as per-sample scalar rows
plus the noise tensor — the sampled augmentation distribution is
bit-identical to the XLA chain; only the elementwise arithmetic moves
into Mosaic. The arithmetic itself is written in the same operation
order as the unfused ops, so outputs agree to a few f32 ulp (FMA
contraction is compiler discretion, and the 3x3 blur's separable
two-pass accumulation order differs from XLA's conv reduction, so
bit-exactness across compilation modes is not claimed — the pin is
tests/test_photometric_kernel.py's atol=2e-6 end-to-end agreement).

Layout: the (B, H, W, C) image packs rows to (B, H, W*C) exactly like the
warp kernel — W*C <= 128 keeps a full image row in one vreg, so channel
arithmetic (luma, hue shift) is lane arithmetic and the blur's horizontal
neighbors are lane rolls by C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# fparams column layout (per sample). Gates are 0.0/1.0 floats, compared
# against 0.5 in-kernel.
MEDIUM_F = 24  # bc(3) hsv1(4) blur(1) noise(2) cut(1) hsv2(4) shadow(5)
#                fog(2) posterize(1) equalize(1)
MEDIUM_I = 4   # cutout y0, hh, x0, ww
HEAVY_F = 12   # bc(3) hsv(4) blur(1) noise(2) cutA(1) cutB(1)
HEAVY_I = 8    # two cutout rectangles


def _roll_lane(x, shift):
    """Circular lane roll with jnp.roll semantics (out[l] = in[l-shift])."""
    lpad = x.shape[-1]
    return pltpu.roll(x, shift % lpad, axis=x.ndim - 1)


def _roll_row(x, shift):
    rows = x.shape[1]
    return pltpu.roll(x, shift % rows, axis=1)


def _hsv(x, apply, hue, sat, val, ch):
    """Mirror of data/augment.py:_hsv_shift with channel ops as lane ops.

    luma = 0.299 R + 0.587 G + 0.114 B, accumulated left-to-right like the
    XLA expression; hue shifts R by +hue and B by -hue (the channel concat
    in the unfused op). Lane rolls never cross a useful boundary: luma is
    read only at ch==0 lanes (l+1, l+2 in range) and broadcast back via
    right-rolls read only at ch==1/2 lanes (l-1, l-2 in range)."""
    wv = jnp.where(ch == 0, 0.299, jnp.where(ch == 1, 0.587, 0.114))
    p = x * wv
    luma0 = (p + _roll_lane(p, -1)) + _roll_lane(p, -2)
    luma = jnp.where(
        ch == 0,
        luma0,
        jnp.where(ch == 1, _roll_lane(luma0, 1), _roll_lane(luma0, 2)),
    )
    sign = jnp.where(ch == 0, 1.0, jnp.where(ch == 1, 0.0, -1.0))
    shifted = x + hue * sign
    out = jnp.clip((luma + (shifted - luma) * sat) * val, 0.0, 1.0)
    return jnp.where(apply, out, x)


def _blur3(x, apply, row, xpix, c, h, w):
    """Gated separable 3x3 [1,2,1]^T[1,2,1]/16 blur, zero outside the
    frame (the unfused op's conv pads with zeros). Horizontal neighbors
    are lane rolls by the channel interleave C; vertical neighbors are
    sublane rolls; rolled-in wrap values are masked off at the frame
    border. Accumulation order differs from XLA's conv (separable
    two-pass vs 9-term window) — agreement is to f32 ulp, pinned by
    tests, not bit-exact."""
    xl = jnp.where(xpix > 0, _roll_lane(x, c), 0.0)
    xr = jnp.where(xpix < w - 1, _roll_lane(x, -c), 0.0)
    t = (xl + 2.0 * x) + xr
    tu = jnp.where(row > 0, _roll_row(t, 1), 0.0)
    td = jnp.where(row < h - 1, _roll_row(t, -1), 0.0)
    out = ((tu + 2.0 * t) + td) * (1.0 / 16.0)
    return jnp.where(apply, out, x)


def _cutout(x, apply, y0, hh, x0, ww, row, xpix):
    hole = (
        (row >= y0) & (row < y0 + hh) & (xpix >= x0) & (xpix < x0 + ww)
    )
    return jnp.where(apply & hole, 0.0, x)


def _photometric_kernel(f_ref, i_ref, x_ref, n_ref, o_ref, *, variant,
                        c, h, w):
    x = x_ref[...]                       # (TB, H, W*C) f32
    nz = n_ref[...]
    fp = f_ref[...]                      # (TB, F)
    ip = i_ref[...]                      # (TB, I) int32
    tb, rows, lpad = x.shape

    def P(i):
        return fp[:, i].reshape(tb, 1, 1)

    def G(i):
        return P(i) > 0.5

    def I(i):  # noqa: E743 — per-sample int param, broadcast-shaped
        return ip[:, i].reshape(tb, 1, 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, rows, lpad), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, rows, lpad), 1)
    ch = lane % c
    xpix = lane // c

    # 1. brightness/contrast: clip((x-0.5)*contr + 0.5 + bright)
    x = jnp.where(
        G(0), jnp.clip((x - 0.5) * P(2) + 0.5 + P(1), 0.0, 1.0), x
    )
    # 2. HSV jitter
    x = _hsv(x, G(3), P(4), P(5), P(6), ch)
    # 3. blur
    x = _blur3(x, G(7), row, xpix, c, h, w)
    # 4. gaussian noise: clip(x + noise*sigma)
    x = jnp.where(G(8), jnp.clip(x + nz * P(9), 0.0, 1.0), x)
    # 5. cutout
    x = _cutout(x, G(10), I(0), I(1), I(2), I(3), row, xpix)

    if variant == "medium":
        # 6. second HSV (ColorJitter approximation)
        x = _hsv(x, G(11), P(12), P(13), P(14), ch)
        # 7. shadow: darken the half-plane cos*xn + sin*yn > offset
        yn = row.astype(jnp.float32) / h - 0.5
        xn = xpix.astype(jnp.float32) / w - 0.5
        side = (P(16) * xn + P(17) * yn) > P(18)
        x = jnp.where(G(15), jnp.where(side, x * P(19), x), x)
        # 8. fog: blend toward white
        x = jnp.where(G(20), x * (1.0 - P(21)) + P(21), x)
        # 9. posterize to 4 bits
        x = jnp.where(G(22), jnp.round(x * 15.0) / 15.0, x)
        # 10. equalize approximation: per-image contrast stretch. The
        # reduction must run sublanes-first then lanes: a fused
        # axis=(1,2) (or lanes-first) reduce SIGABRTs / 100x-slows the
        # Mosaic compiler on (64, 32, 96) f32 blocks (bisected on
        # v5e, jax 0.9).
        lo = jnp.min(jnp.min(x, axis=1, keepdims=True), axis=2,
                     keepdims=True)
        hi = jnp.max(jnp.max(x, axis=1, keepdims=True), axis=2,
                     keepdims=True)
        stretched = (x - lo) / jnp.maximum(hi - lo, 1e-6)
        x = jnp.where(G(23), stretched, x)
    else:  # heavy_extra: a second cutout instead of the exotics
        x = _cutout(x, G(11), I(4), I(5), I(6), I(7), row, xpix)

    o_ref[...] = x


def _pick_tile(batch: int, want: int) -> int:
    t = min(want, batch)
    while batch % t:
        t -= 1
    return t


def photometric_ok(h: int, w: int, c: int) -> bool:
    """Shape gate: one packed image row must fit a vreg's lanes and the
    blur needs a 3x3 neighborhood."""
    return c == 3 and w * c <= LANES and h >= 3 and w >= 3


@functools.partial(
    jax.jit, static_argnames=("variant", "tile_b", "interpret")
)
def photometric_block(
    x: jnp.ndarray,        # (B, H, W, C) float32 in [0,1]
    noise: jnp.ndarray,    # (B, H, W, C) unit-normal draws
    fparams: jnp.ndarray,  # (B, MEDIUM_F | HEAVY_F) f32
    iparams: jnp.ndarray,  # (B, MEDIUM_I | HEAVY_I) int32
    *,
    variant: str,          # "medium" | "heavy_extra"
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One photometric augmentation block as a single Pallas kernel."""
    b, h, w, c = x.shape
    assert photometric_ok(h, w, c), (h, w, c)
    nf, ni = (
        (MEDIUM_F, MEDIUM_I) if variant == "medium" else (HEAVY_F, HEAVY_I)
    )
    assert fparams.shape == (b, nf) and iparams.shape == (b, ni), (
        fparams.shape, iparams.shape, variant
    )
    lpad = w * c
    tb = _pick_tile(b, tile_b)
    out = pl.pallas_call(
        functools.partial(_photometric_kernel, variant=variant, c=c,
                          h=h, w=w),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, nf), lambda i: (i, 0)),
            pl.BlockSpec((tb, ni), lambda i: (i, 0)),
            pl.BlockSpec((tb, h, lpad), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, h, lpad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, h, lpad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, lpad), jnp.float32),
        interpret=interpret,
    )(fparams, iparams, x.reshape(b, h, lpad), noise.reshape(b, h, lpad))
    return out.reshape(b, h, w, c)
