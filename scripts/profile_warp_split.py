#!/usr/bin/env python3
"""Round-5 follow-up: decompose the composed-warp cost.

After the RNG accounting correction (profile_batched_draws.py), the two
composed warps (~0.72 ms each at 1024x32x32x3) are the dominant
remaining term of the heavy-tier augmentation Δ — 4–5× their ~0.15 ms
HBM bound. This probe splits one warp into its parts to find where the
time goes:

  1. swap blend (jnp.where over the axis-swapped batch)   [XLA]
  2. lerp_pass 1 (Pallas lane-gather kernel)              [Mosaic]
  3. H<->W transpose of the intermediate                  [XLA]
  4. lerp_pass 2                                          [Mosaic]
  5. final transpose                                      [XLA]

plus the full warp for cross-checking, and a no-gather control kernel
(same index arithmetic + lerp, gathers replaced by the identity) to
price Mosaic's dynamic_gather itself.

Usage: python scripts/profile_warp_split.py   (needs the TPU chip).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from nnue_vision_tpu.data import augment as A
from nnue_vision_tpu.ops import warp_kernel as WK
from nnue_vision_tpu.ops.timing import scalar_chained_best_ms

import os

B, H, W, C = 1024, 32, 32, 3
# REPS must be large enough that per-dispatch device work dominates the
# tunneled backend's ~25 ms host launch latency: at REPS=50 every
# variant floor-clamps to ~25/50 = 0.5 ms/step regardless of its true
# cost (measured 2026-08-20 — transpose 0.514, swap 0.549, lerp_pass
# 0.566, yet the full 5-stage warp is only 0.723: non-additive ⇒
# launch-bound). Default 400 puts ≥80 ms of device work per dispatch.
REPS = int(os.environ.get("WARP_SPLIT_REPS", "400"))


def _nogather_kernel(coef_ref, x_ref, o_ref, *, n, c):
    """lerp_pass with the two dynamic gathers replaced by identity reads —
    isolates the cost of tpu.dynamic_gather from the index arithmetic."""
    xv = x_ref[...]
    tb, r_dim, lpad = xv.shape
    k_row = coef_ref[:, 0].reshape(tb, 1, 1)
    k_lane = coef_ref[:, 1].reshape(tb, 1, 1)
    k_c = coef_ref[:, 2].reshape(tb, 1, 1)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tb, r_dim, lpad), 1
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, r_dim, lpad), 2)
    xcoord = (lane // c).astype(jnp.float32)
    pos = k_row * rows + k_lane * xcoord + k_c
    i0f = jnp.floor(pos)
    fr = pos - i0f
    i0 = i0f.astype(jnp.int32)
    valid0 = (i0 >= 0) & (i0 < n)
    valid1 = (i0 + 1 >= 0) & (i0 + 1 < n)
    v0 = jnp.where(valid0, xv, 0.0)
    v1 = jnp.where(valid1, xv, 0.0)
    o_ref[...] = v0 * (1.0 - fr) + v1 * fr


@functools.partial(jax.jit, static_argnames=("n", "c"))
def _nogather_pass(x, coef, *, n, c):
    b, r_dim, lpad = x.shape
    tb = 64
    return pl.pallas_call(
        functools.partial(_nogather_kernel, n=n, c=c),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, 3), lambda i: (i, 0)),
            pl.BlockSpec((tb, r_dim, lpad), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, r_dim, lpad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, r_dim, lpad), jnp.float32),
    )(coef, x)


def main():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    key = jax.random.PRNGKey(5)
    print("platform:", jax.devices()[0].platform, flush=True)

    ks = jax.random.split(key, 4)
    mv = A._geom_hflip(ks[0], B, 0.5)
    mv = A._mv_compose(mv, A._geom_rot90(ks[1], B, 0.5))
    mv = A._mv_compose(
        mv, A._geom_affine(ks[2], B, 0.3, 15.0, 0.0, (1.0, 1.0001), H, W)
    )
    mv = A._mv_compose(
        mv, A._geom_affine(ks[3], B, 0.3, 15.0, 0.1, (0.9, 1.1), H, W)
    )
    m, v = mv
    swap, coef1, coef2 = WK.warp_coefficients(m, v, H, W)

    def full_warp(d, bump):
        return WK.warp_bilinear(d + bump, mv)

    def swap_blend(d, bump):
        d = d + bump
        return jnp.where(swap[:, None, None, None], jnp.swapaxes(d, 1, 2), d)

    def pass1_only(d, bump):
        packed = (d + bump).reshape(B, H, W * C)
        return WK.lerp_pass(packed, coef1, n=W, c=C)

    def transpose_only(d, bump):
        t = (d + bump)
        return jnp.swapaxes(t, 1, 2).reshape(B, W, H * C)

    def nogather_only(d, bump):
        packed = (d + bump).reshape(B, H, W * C)
        return _nogather_pass(packed, coef1, n=W, c=C)

    def both_passes_no_transpose(d, bump):
        packed = (d + bump).reshape(B, H, W * C)
        t1 = WK.lerp_pass(packed, coef1, n=W, c=C)
        return WK.lerp_pass(t1, coef2, n=W, c=C)

    import os
    want = os.environ.get("WARP_SPLIT_ONLY", "")
    variants = (
        ("H<->W transpose alone [xla]   ", transpose_only),
        ("swap blend alone [xla]        ", swap_blend),
        ("lerp_pass alone [pallas]      ", pass1_only),
        ("no-gather control [pallas]    ", nogather_only),
        ("2 lerp passes, no transposes  ", both_passes_no_transpose),
        ("full warp (5 stages)          ", full_warp),
    )
    for name, fn in variants:
        if want and want not in name:
            continue
        ms = scalar_chained_best_ms(fn, x, REPS)
        print(f"{name}: {ms:7.3f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
