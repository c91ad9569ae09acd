#!/usr/bin/env python3
"""Round-5 follow-up probe: does BATCHING the medium/heavy tier's random
draws into one uniform + one normal call beat the current 26 separate
`jax.random` calls on the hardware RNG?

Motivation (docs/TRAIN_ROOFLINE.md round-5 finding 4): after the rbg
switch, ~0.58 ms/step of the 3.37 ms EtinyNet production step is the
tier's draws. Each `jax.random.uniform`/`normal` call lowers to its own
RngBitGenerator + conversion kernels; 26 small calls pay 26 kernel
overheads. The candidate replacement draws ONE (24, B) uniform tensor
(sliced per op) and ONE (2, B, H, W, C) normal tensor per tier — the
same number of random bits, ~24× fewer kernels.

Distribution note: this changes the REALIZATION (different bits feed
each op) but not the sampled distribution — the same trade the rbg
switch already made and documented (data/augment.py). Only shipped if
the measured win clears ~0.15 ms/step; otherwise recorded as a negative
result like the scalar-prefetch gather kernel.

MEASURED (v5e, batch 1024, round 5): NEGATIVE on every axis, and the
floor variant corrects the round-5 accounting —

    current: 26 separate rbg calls   0.609 ms/step
    batched smalls (3 rbg calls)     0.576
    fully batched (2 rbg calls)      0.609
    bf16 normals, smalls as-is       0.654   (WORSE — bf16 erfinv path
                                              adds conversion, saves no
                                              vector work)
    no normals (24 smalls only)      0.535

Removing BOTH full-size normals saves only 0.074 ms and batching the
smalls 0.033 — so the true device cost of the tier's rbg draws is
~0.1 ms/step. The remaining ~0.5 ms this harness measures is its OWN
scaffolding (24 per-draw `.sum()` reduction kernels + the chained
full-tensor adds), which the earlier draw probes in
profile_photometric_rng.py share — i.e. the roofline's "~0.58 ms of
rbg draws" line attributed harness kernels to the RNG. Production
implication: the augmentation Δ that remains after the fused
photometric kernel is dominated by the two composed warps (~0.72 ms
each), not by RNG; no RNG lever worth shipping exists. Kept unshipped;
the call structure in data/augment.py stays op-per-draw (the testable
shape).

Usage: python scripts/profile_batched_draws.py  (needs the TPU chip).
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

    def current(d, bump):
        """The shipped draw pattern: 26 separate rbg calls."""
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        ks = jax.random.split(k, 26)
        n1 = jax.random.normal(ks[24], d.shape)
        n2 = jax.random.normal(ks[25], d.shape)
        acc = bump
        for i in range(24):
            acc = acc + jax.random.uniform(ks[i], (B, 1, 1, 1)).sum() * 1e-9
        return d + acc + n1 * 1e-6 + n2 * 1e-6

    def batched(d, bump):
        """Candidate: one (24,B) uniform + one (2,B,H,W,C) normal."""
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        ku, kn = jax.random.split(k, 2)
        u = jax.random.uniform(ku, (24, B, 1, 1, 1))
        n = jax.random.normal(kn, (2,) + d.shape)
        acc = bump
        for i in range(24):
            acc = acc + u[i].sum() * 1e-9
        return d + acc + n[0] * 1e-6 + n[1] * 1e-6

    def batched_smalls_only(d, bump):
        """Half-candidate: batch only the 24 small draws; normals as-is."""
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        ku, k1, k2 = jax.random.split(k, 3)
        u = jax.random.uniform(ku, (24, B, 1, 1, 1))
        n1 = jax.random.normal(k1, d.shape)
        n2 = jax.random.normal(k2, d.shape)
        acc = bump
        for i in range(24):
            acc = acc + u[i].sum() * 1e-9
        return d + acc + n1 * 1e-6 + n2 * 1e-6

    def bf16_normals(d, bump):
        """Candidate: the two full-size normals drawn in bfloat16 (half
        the random bits, half the HBM write), smalls unchanged."""
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        ks = jax.random.split(k, 26)
        n1 = jax.random.normal(ks[24], d.shape, dtype=jnp.bfloat16)
        n2 = jax.random.normal(ks[25], d.shape, dtype=jnp.bfloat16)
        acc = bump
        for i in range(24):
            acc = acc + jax.random.uniform(ks[i], (B, 1, 1, 1)).sum() * 1e-9
        return (d + acc + n1.astype(jnp.float32) * 1e-6
                + n2.astype(jnp.float32) * 1e-6)

    def no_normals(d, bump):
        """Floor: the 24 smalls alone (what removing the noise tensors
        entirely would leave)."""
        k = A._to_rbg_key(jax.random.fold_in(key, bump.astype(jnp.int32)))
        ks = jax.random.split(k, 26)
        acc = bump
        for i in range(24):
            acc = acc + jax.random.uniform(ks[i], (B, 1, 1, 1)).sum() * 1e-9
        return d + acc

    for name, fn in (
        ("current: 26 separate rbg calls", current),
        ("batched smalls (3 rbg calls)  ", batched_smalls_only),
        ("fully batched (2 rbg calls)   ", batched),
        ("bf16 normals, smalls as-is    ", bf16_normals),
        ("no normals (24 smalls only)   ", no_normals),
    ):
        ms = scalar_chained_best_ms(fn, x, REPS)
        print(f"{name}: {ms:7.3f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
