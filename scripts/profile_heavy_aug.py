#!/usr/bin/env python3
"""Stage-level roofline of the medium/heavy augmentation tiers (round 5).

EtinyNet heavy-tier training measured 29.3k img/s (35 ms/step at batch
1024) vs a 363k img/s (2.8 ms) no-aug bound — this script decomposes the
~32 ms augmentation cost into its stages so the fused-kernel design
targets the real bottleneck instead of a guess.

Timing contract (repo standard): K scan-chained applications per
dispatch, carry-threaded (each iteration consumes the previous output),
forced device→host readback of a value data-depending on the last
iteration, best of 3 dispatches.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.data import augment as A

B, H, W = 1024, 32, 32
K = 32  # applications per dispatch


def timed(name, body, x0, reps=3):
    """body(key, x) -> x ; scan K times, chained through the carry."""

    @jax.jit
    def run(key, x):
        def step(carry, i):
            x = carry
            k = jax.random.fold_in(key, i)
            x = body(k, x)
            return x, ()

        out, _ = jax.lax.scan(step, x, jnp.arange(K))
        return out[:1, :1, :1, :]

    np.asarray(run(jax.random.PRNGKey(0), x0))  # compile + warm
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(jax.random.PRNGKey(r + 1), x0))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000.0
    print(f"{name:38s} {ms:8.3f} ms/step  {B / (ms / 1000.0):12.0f} img/s")
    return ms


def main():
    np.asarray(jnp.zeros(()))  # init d2h path
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))

    print(f"batch {B}, {H}x{W}x3, {K} steps/dispatch, best of 3\n")

    timed("noop (carry only)", lambda k, x: x * 1.0, x0)
    timed("full light tier", lambda k, x: A.augment_batch(k, x, "light"), x0)
    timed("full medium tier", lambda k, x: A.augment_batch(k, x, "medium"), x0)
    timed("full heavy tier", lambda k, x: A.augment_batch(k, x, "heavy"), x0)

    # geometry: the composed warp alone (heavy tier's mv chain)
    def heavy_warp(k, x):
        ks = list(jax.random.split(k, 24))
        b, h, w, _ = x.shape
        mv = A._geom_hflip(ks[0], b, 0.5)
        mv = A._mv_compose(mv, A._geom_rot90(ks[1], b, 0.5))
        mv = A._mv_compose(
            mv, A._geom_affine(ks[2], b, 0.3, 15.0, 0.0, (1.0, 1.0001), h, w))
        mv = A._mv_compose(
            mv, A._geom_affine(ks[3], b, 0.3, 15.0, 0.1, (0.9, 1.1), h, w))
        mv = A._mv_compose(mv, A._geom_hflip(ks[10], b, 0.1))
        mv = A._mv_compose(mv, A._geom_rot90(ks[11], b, 0.1))
        mv = A._mv_compose(
            mv, A._geom_affine(ks[12], b, 0.2, 25.0, 0.0, (1.0, 1.0001), h, w))
        mv = A._mv_compose(
            mv, A._geom_affine(ks[13], b, 0.2, 25.0, 0.15, (0.85, 1.15), h, w))
        return A._warp(x, mv)

    timed("composed warp only (heavy mv chain)", heavy_warp, x0)

    def warp_identity(k, x):
        b = x.shape[0]
        return A._warp(x, A._mv_identity(b))

    timed("warp w/ identity maps (gather cost)", warp_identity, x0)

    # photometric stages, individually
    timed("brightness_contrast",
          lambda k, x: A._brightness_contrast(k, x, 0.3, 0.2), x0)
    timed("hsv_shift", lambda k, x: A._hsv_shift(
        k, x, 0.3, 10 / 255.0, 0.15, 10 / 255.0), x0)
    timed("blur (depthwise conv)", lambda k, x: A._blur(k, x, 0.2), x0)
    timed("gauss_noise", lambda k, x: A._gauss_noise(
        k, x, 0.2, (0.01, 0.05)), x0)
    timed("cutout", lambda k, x: A._cutout(k, x, 0.3, (0.05, 0.15)), x0)
    timed("shadow", lambda k, x: A._shadow(k, x, 0.1), x0)
    timed("fog", lambda k, x: A._fog(k, x, 0.1), x0)
    timed("posterize", lambda k, x: A._posterize(k, x, 0.1), x0)
    timed("equalize_approx", lambda k, x: A._equalize_approx(k, x, 0.1), x0)

    # the full medium photometric chain (no geometry)
    def medium_photo(k, x):
        ks = list(jax.random.split(k, 24))
        x = A._brightness_contrast(ks[4], x, 0.3, 0.2)
        x = A._hsv_shift(ks[5], x, 0.3, 10 / 255.0, 0.15, 10 / 255.0)
        x = A._blur(ks[6], x, 0.2)
        x = A._gauss_noise(ks[7], x, 0.2, (0.01, 0.05))
        x = A._cutout(ks[8], x, 0.3, (0.05, 0.15))
        x = A._hsv_shift(ks[9], x, 0.2, 8 / 255.0, 0.1, 8 / 255.0)
        x = A._shadow(ks[20], x, 0.1)
        x = A._fog(ks[21], x, 0.1)
        x = A._posterize(ks[22], x, 0.1)
        x = A._equalize_approx(ks[23], x, 0.1)
        return x

    timed("medium photometric chain (no geom)", medium_photo, x0)

    # RNG cost probe: all the normal draws gauss_noise needs
    def noise_draw_only(k, x):
        return x + 0.0 * jax.random.normal(k, x.shape)

    timed("random.normal(B,H,W,3) draw only", noise_draw_only, x0)


if __name__ == "__main__":
    main()
