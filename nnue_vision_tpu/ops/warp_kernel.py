"""Pallas bilinear warp: the two-pass resample as in-VMEM lane gathers.

The composed-geometry warp (data/augment.py) is the entire cost of the
medium/heavy augmentation tiers: XLA lowers the per-element
`take_along_axis` gather to DMA-latency-bound code (32 ms for a
1024×32×32×3 batch — 1000× its HBM bound), and the one-hot-matmul
rewrite still pays ~6 ms because (32×32)@(32×3) batched matmuls pad the
MXU's 128-lane tiles to ~2% utilization (scripts/profile_heavy_aug.py).

The TPU-native primitive for this is Mosaic's `tpu.dynamic_gather`
(`jnp.take_along_axis` inside a Pallas kernel), which permutes lanes
within a vector register — valid whenever the gathered axis fits in ONE
vreg (≤ 128 lanes). A 32×32×3 image row packs to W·C = 96 lanes, so each
warp pass is a per-row lane gather:

  pass 1 (horizontal):  tmp(yi, xo) = in(yi, q(yi, xo))
  pass 2 (vertical):    out(yo, xo) = tmp(p(yo, xo), xo)

with q, p affine in the output coordinates (the Catmull–Smith 1980
decomposition — see data/augment.py:_warp for the derivation and the
conformality argument that bounds its conditioning). Both passes are the
SAME kernel: "resample each row along its lane axis at positions
k_row·row + k_lane·lane + k_c", pass 2 running on the (H ↔ W)-transposed
intermediate with its coefficient roles swapped. The transposes and the
per-sample axis-swap blend stay in XLA (cheap middle-dim transposes);
the gathers, bounds masks, and lerp run on the VPU in one kernel per
pass.

Upstream equivalent: the Albumentations geometric transforms applied on
the host per sample (reference data/datasets.py:173-374). Here the whole
batch warps on-device in ~0.3 ms instead of 32 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lerp_pass_kernel(coef_ref, x_ref, o_ref, *, n, c):
    """One resample pass over (TB, R, N·C) packed rows.

    For each sample b, row r, lane l = x·C + ch:
      pos  = k_row·r + k_lane·x + k_c          (absolute source coordinate)
      out  = in[b, r, floor(pos)·C + ch]·(1−fr) + in[b, r, ⌈pos⌉·C + ch]·fr
    with zero contribution from out-of-range corners (cval=0 semantics).
    All index math is exact f32/int32; exact-integer positions (fr = 0)
    reproduce input bits exactly (rot90 / flips / integer translations).
    """
    xv = x_ref[...]                      # (TB, R, N*C)
    tb, r_dim, lpad = xv.shape
    k_row = coef_ref[:, 0].reshape(tb, 1, 1)
    k_lane = coef_ref[:, 1].reshape(tb, 1, 1)
    k_c = coef_ref[:, 2].reshape(tb, 1, 1)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tb, r_dim, lpad), 1
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, r_dim, lpad), 2)
    xcoord = (lane // c).astype(jnp.float32)
    ch = lane % c

    pos = k_row * rows + k_lane * xcoord + k_c
    i0f = jnp.floor(pos)
    fr = pos - i0f
    i0 = i0f.astype(jnp.int32)
    valid0 = (i0 >= 0) & (i0 < n)
    valid1 = (i0 + 1 >= 0) & (i0 + 1 < n)
    g0 = jnp.clip(i0, 0, n - 1) * c + ch
    g1 = jnp.clip(i0 + 1, 0, n - 1) * c + ch

    flat = xv.reshape(tb * r_dim, lpad)
    v0 = jnp.take_along_axis(flat, g0.reshape(tb * r_dim, lpad), axis=1)
    v1 = jnp.take_along_axis(flat, g1.reshape(tb * r_dim, lpad), axis=1)
    v0 = jnp.where(valid0.reshape(tb * r_dim, lpad), v0, 0.0)
    v1 = jnp.where(valid1.reshape(tb * r_dim, lpad), v1, 0.0)
    out = v0 * (1.0 - fr.reshape(tb * r_dim, lpad)) + v1 * fr.reshape(
        tb * r_dim, lpad
    )
    o_ref[...] = out.reshape(tb, r_dim, lpad)


def _pick_tile(batch: int, want: int) -> int:
    t = min(want, batch)
    while batch % t:
        t -= 1
    return t


@functools.partial(
    jax.jit, static_argnames=("n", "c", "tile_b", "interpret")
)
def lerp_pass(
    x: jnp.ndarray,       # (B, R, N*C) packed rows, float32
    coef: jnp.ndarray,    # (B, 3) f32: [k_row, k_lane, k_c]
    *,
    n: int,               # source extent along the resampled axis
    c: int,               # channel interleave factor (lane = x*C + ch)
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One linear resample pass as a single Pallas kernel (see module doc)."""
    b, r_dim, lpad = x.shape
    assert lpad == n * c and lpad <= LANES, (lpad, n, c)
    tb = _pick_tile(b, tile_b)
    return pl.pallas_call(
        functools.partial(_lerp_pass_kernel, n=n, c=c),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3), lambda i: (i, 0)),
            pl.BlockSpec((tb, r_dim, lpad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, r_dim, lpad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r_dim, lpad), jnp.float32),
        interpret=interpret,
    )(coef, x)


def warp_coefficients(m: jnp.ndarray, v: jnp.ndarray, h: int, w: int):
    """Factor per-sample inverse maps into (swap, pass-1, pass-2) terms.

    Returns (swap (B,) bool, coef1 (B,3), coef2 (B,3)) where the passes
    evaluate absolute source coordinates directly:
      pass 1:  q = coef1·[yi, xo, 1]   (gather along x, extent W)
      pass 2:  p = coef2·[xo, yo, 1]   (gather along y on the transposed
                                        intermediate, extent H)
    The optional axis swap (dominant off-diagonal mass — the rot90/flip
    part of a conformal map) is factored out first so pass 1's pivot
    |m00| stays bounded below (data/augment.py:_warp docstring).
    """
    swap = (jnp.abs(m[:, 0, 0]) + jnp.abs(m[:, 1, 1])) < (
        jnp.abs(m[:, 0, 1]) + jnp.abs(m[:, 1, 0])
    )
    ms = jnp.where(swap[:, None, None], m[:, ::-1, :], m)
    vs = jnp.where(swap[:, None], v[:, ::-1], v)
    a = ms[:, 0, 0]
    bb = ms[:, 0, 1]
    cc = ms[:, 1, 0]
    d = ms[:, 1, 1]
    e = vs[:, 0]
    f = vs[:, 1]
    a = jnp.where(jnp.abs(a) < 1e-3, jnp.where(a < 0, -1e-3, 1e-3), a)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    r = cc / a
    # pass 1 (rows = yi, lanes = xo): q_abs = r·(yi−cy) + (d−r·b)·(xo−cx)
    #                                        + (f−r·e) + cx
    q_row = r
    q_lane = d - r * bb
    q_c = (f - r * e) + cx - r * cy - q_lane * cx
    # pass 2 (rows = xo, lanes = yo): p_abs = a·(yo−cy) + b·(xo−cx) + e + cy
    p_row = bb
    p_lane = a
    p_c = e + cy - a * cy - bb * cx
    coef1 = jnp.stack([q_row, q_lane, q_c], axis=-1).astype(jnp.float32)
    coef2 = jnp.stack([p_row, p_lane, p_c], axis=-1).astype(jnp.float32)
    return swap, coef1, coef2


def warp_bilinear(
    x: jnp.ndarray,          # (B, H, W, C) float32
    mv,                      # ((B,2,2), (B,2)) composed inverse maps
    *,
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-sample affine warp of a square batch via two Pallas passes.

    Same decomposition as the one-hot-matmul `_warp` (bit-identical for
    exact-grid maps; ≤ a few f32 ulp apart on fractional maps because the
    constant terms fold differently). Requires H == W, W·C ≤ 128, and
    H % 8 == 0 (sublane-aligned row merging); callers gate on that.
    """
    b, h, w, c = x.shape
    assert h == w and w * c <= LANES and h % 8 == 0, (h, w, c)
    m, v = mv
    swap, coef1, coef2 = warp_coefficients(m, v, h, w)

    # dihedral axis-swap blend (exact pixel permutation for square images)
    xs = jnp.where(swap[:, None, None, None], jnp.swapaxes(x, 1, 2), x)

    packed = xs.reshape(b, h, w * c)
    tmp = lerp_pass(packed, coef1, n=w, c=c, tile_b=tile_b,
                    interpret=interpret)
    # transpose H ↔ W for the vertical pass (C stays minor)
    tmp_t = jnp.swapaxes(tmp.reshape(b, h, w, c), 1, 2).reshape(b, w, h * c)
    out_t = lerp_pass(tmp_t, coef2, n=h, c=c, tile_b=tile_b,
                      interpret=interpret)
    return jnp.swapaxes(out_t.reshape(b, w, h, c), 1, 2)
