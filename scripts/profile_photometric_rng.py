#!/usr/bin/env python3
"""Round-5 augmentation probes: photometric fusion + RNG implementation.

Reproduces the three measurements behind docs/TRAIN_ROOFLINE.md round-5
findings 3–4 (run on a real chip; each probe is scan-chained best-of-3
per ops/timing.py):

1. `augment_batch` medium/heavy with the photometric chain as XLA ops
   vs as the single Pallas kernel (`ops/photometric_kernel.py`).
   Measured (v5e, batch 1024): heavy 2.173 → 1.929 ms/step; medium
   neutral (1.371 both) — XLA already fused the elementwise chain.
2. A cost breakdown of the heavy-tier step: the two full-size
   `jax.random.normal` noise tensors (0.744 ms), the 24 small
   per-sample draws (0.535 ms), one composed warp (0.723 ms), and the
   medium photometric block both ways (1.010 / 1.090 ms incl. draws) —
   the draws dominate, which motivated probe 3.
3. threefry vs rbg vs unsafe_rbg for the tier's ~26 draws, plus the
   threefry→rbg key bridge `data/augment._to_rbg_key`. Measured:
   0.829 / 0.583 / 0.578 / 0.578 ms — the bridge is free and rbg (the
   TPU hardware RNG via XLA RngBitGenerator) is now the medium/heavy
   production path.

Upstream analogue: none (the reference augments per-sample on the host
via albumentations, data/datasets.py:173-374; its pipeline is not on
the training critical path the same way).

Usage: python scripts/profile_photometric_rng.py  (requires the TPU;
CPU runs work but measure nothing representative).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.data import augment as A
from nnue_vision_tpu.ops.timing import scalar_chained_best_ms

B, H, W, C = 1024, 32, 32, 3
REPS = 50


def main():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    key = jax.random.PRNGKey(123)
    print("platform:", jax.devices()[0].platform, flush=True)

    # -- probe 1: full tiers, photometric xla vs pallas ----------------- #
    for strength in ("medium", "heavy"):
        for impl in ("xla", "pallas"):
            A.set_photometric_impl(impl)

            def fwd(d, bump, strength=strength):
                return A.augment_batch(key, d + bump, strength=strength)

            ms = scalar_chained_best_ms(fwd, x, REPS)
            print(f"tier {strength:6s} photometric={impl:6s}: "
                  f"{ms:7.3f} ms/step ({B/ms:.0f}k img/s)", flush=True)
    A.set_photometric_impl("auto")

    # -- probe 2: breakdown --------------------------------------------- #
    def draws_only(d, bump):
        k = jax.random.fold_in(key, 0)
        n1 = jax.random.normal(jax.random.fold_in(k, 1), d.shape)
        n2 = jax.random.normal(jax.random.fold_in(k, 2), d.shape)
        return d + bump + n1 * 1e-6 + n2 * 1e-6

    def small_draws(d, bump):
        ks = jax.random.split(key, 24)
        acc = bump
        for i in range(24):
            acc = acc + jax.random.uniform(ks[i], (B, 1, 1, 1)).sum() * 1e-9
        return d + acc

    def one_warp(d, bump):
        b = d.shape[0]
        ks = jax.random.split(key, 4)
        mv = A._geom_hflip(ks[0], b, 0.5)
        mv = A._mv_compose(mv, A._geom_rot90(ks[1], b, 0.5))
        mv = A._mv_compose(
            mv, A._geom_affine(ks[2], b, 0.3, 15.0, 0.0, (1.0, 1.0001), H, W)
        )
        mv = A._mv_compose(
            mv, A._geom_affine(ks[3], b, 0.3, 15.0, 0.1, (0.9, 1.1), H, W)
        )
        return A._warp(d + bump, mv)

    for name, fn in (
        ("2x full-size normal draws", draws_only),
        ("24 small per-sample draws", small_draws),
        ("1 composed warp (4 geoms)", one_warp),
    ):
        ms = scalar_chained_best_ms(fn, x, REPS)
        print(f"{name:28s}: {ms:7.3f} ms/step", flush=True)

    # -- probe 3: RNG implementations ----------------------------------- #
    def draw_suite(k):
        def fn(d, bump):
            ks = jax.random.split(k, 26)
            n1 = jax.random.normal(ks[24], d.shape)
            n2 = jax.random.normal(ks[25], d.shape)
            acc = bump
            for i in range(24):
                acc = acc + jax.random.uniform(
                    ks[i], (B, 1, 1, 1)).sum() * 1e-9
            return d + acc + n1 * 1e-6 + n2 * 1e-6
        return fn

    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        ms = scalar_chained_best_ms(
            draw_suite(jax.random.key(123, impl=impl)), x, REPS
        )
        print(f"rng {impl:14s}: 2 normals + 24 smalls = {ms:7.3f} ms/step",
              flush=True)

    def bridged(d, bump):
        # runtime-dependent key so the bridge cost is inside the timing
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        return draw_suite(k)(d, bump)

    ms = scalar_chained_best_ms(bridged, x, REPS)
    print(f"rng threefry->rbg bridge   : 2 normals + 24 smalls = "
          f"{ms:7.3f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
