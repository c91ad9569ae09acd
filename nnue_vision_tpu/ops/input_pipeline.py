"""Fused device-side input pipeline: gather → light augment → normalize
in ONE Pallas kernel (VERDICT r3 item 3 — closing the train dispatch floor).

Why this exists: the train-step roofline (docs/TRAIN_ROOFLINE.md) showed
the production step is bounded by per-kernel dispatch machinery, not
FLOPs or HBM bytes — the batch gather (`jnp.take`) plus the light
augmentation tier plus normalization execute as ~7 separate kernels per
scan iteration, each paying a fixed launch cost that dominates at this
model size. This module collapses the whole input path into a single
Pallas kernel and hoists all per-step randomness out of the scan body:

- The horizontal flip is folded into the GATHER INDEX: the device holds
  the dataset concatenated with its W-flipped copy (``prepare_gather_
  dataset``), and a coin flip adds N to the row index. The flip costs
  zero kernels and zero compute.
- Brightness/contrast is folded to one FMA: ``clip(x·α + β, 0, 1)`` with
  per-sample α/β precomputed from the (apply?, contrast, brightness)
  draws. Identity (α=1, β=0) when the coin says no — exact because the
  un-augmented input is already in [0, 1].
- CoarseDropout becomes an iota-vs-scalar rectangle mask; an empty
  rectangle (y0 = y1 = 0) when not applied.
- ImageNet normalization is a per-flat-index (mean, 1/std) row vector
  baked once per trace.

Rows are gathered by manual async DMA from an HBM-resident dataset using
scalar-prefetched indices — the canonical Pallas embedding-gather
pattern — so the random-row gather and every elementwise pass ride one
kernel launch.

Semantics: distribution-identical to the XLA ``augment_batch(strength=
"light")`` tier (data/augment.py:233-236 — hflip p=.5, brightness/
contrast p=.2 limit .1, cutout p=.2 frac (.05,.051), then ImageNet
normalize; mirroring the upstream light tier at reference
data/datasets.py:181-197). The RNG STREAM differs (one batched draw per
dispatch instead of per-step key splits), which is the point: per-sample
parameters for all K steps of a dispatch are drawn in a handful of
kernels outside the scan. Tests feed identical parameters to this kernel
and to a pure-jnp reference to pin the math (exact except for ≤1 ulp of
FMA contraction in the brightness/contrast multiply-add;
tests/test_input_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnue_vision_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

LANES = 128


class LightParams(NamedTuple):
    """Per-sample light-tier draws; leading dims (..., B)."""
    flip: jnp.ndarray    # bool — fold into the gather index
    pf: jnp.ndarray      # (..., B, 2) f32: [alpha, beta]
    pi: jnp.ndarray      # (..., B, 4) i32: [y0, y1, x0, x1] (y1<=y0 → empty)


def _rows_for(h: int, w: int) -> int:
    return -(-(h * w * 3) // LANES)


def prepare_gather_dataset(images: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) float [0,1] → (2N, R, 128): flat rows padded to the
    lane width, second half horizontally flipped. Built ONCE per training
    run; a flipped gather index replaces the per-step hflip kernel."""
    n, h, w, _ = images.shape
    rows = _rows_for(h, w)
    both = jnp.concatenate([images, images[:, :, ::-1, :]], axis=0)
    flat = both.reshape(2 * n, h * w * 3)
    pad = rows * LANES - flat.shape[1]
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat.reshape(2 * n, rows, LANES)


def draw_light_params(key: jax.Array, steps: int, batch: int,
                      h: int, w: int) -> LightParams:
    """All light-tier randomness for a K-step dispatch in one batched
    draw (shape (K, B)): the distributions of augment_batch's light tier,
    folded to (flip-bit, FMA coefficients, hole rectangle)."""
    ks = jax.random.split(key, 8)
    shape = (steps, batch)
    flip = jax.random.uniform(ks[0], shape) < 0.5

    bc_apply = jax.random.uniform(ks[1], shape) < 0.2
    bright = jax.random.uniform(ks[2], shape, minval=-0.1, maxval=0.1)
    contr = 1.0 + jax.random.uniform(ks[3], shape, minval=-0.1, maxval=0.1)
    alpha = jnp.where(bc_apply, contr, 1.0)
    beta = jnp.where(bc_apply, 0.5 - 0.5 * contr + bright, 0.0)
    pf = jnp.stack([alpha, beta], axis=-1).astype(jnp.float32)

    cut_apply = jax.random.uniform(ks[4], shape) < 0.2
    frac = jax.random.uniform(ks[5], shape, minval=0.05, maxval=0.051)
    hh = jnp.maximum(1, (frac * h).astype(jnp.int32))
    ww = jnp.maximum(1, (frac * w).astype(jnp.int32))
    y0 = (jax.random.uniform(ks[6], shape) * (h - hh)).astype(jnp.int32)
    x0 = (jax.random.uniform(ks[7], shape) * (w - ww)).astype(jnp.int32)
    y1 = jnp.where(cut_apply, y0 + hh, 0)
    y0 = jnp.where(cut_apply, y0, 0)
    x1 = jnp.where(cut_apply, x0 + ww, 0)
    x0 = jnp.where(cut_apply, x0, 0)
    pi = jnp.stack([y0, y1, x0, x1], axis=-1).astype(jnp.int32)
    return LightParams(flip=flip, pf=pf, pi=pi)


def identity_light_params(steps: int, batch: int) -> LightParams:
    """No-op parameters (no flip / α=1 / empty hole) — the fused kernel
    then equals gather + normalize exactly; used by eval-style callers
    and the equivalence tests."""
    return LightParams(
        flip=jnp.zeros((steps, batch), bool),
        pf=jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (steps, batch, 1)),
        pi=jnp.zeros((steps, batch, 4), jnp.int32),
    )


def _coord_rows(h: int, w: int) -> Tuple[jnp.ndarray, ...]:
    """Per-flat-index (y, x, mean, std) rows of shape (R, 128). Padding
    beyond H·W·3 gets sentinel coords (h, w — outside every hole) and
    mean 0 / std 1. NOTE: padded lanes are NOT pinned to 0 — the
    brightness FMA writes β into them before normalization (mean 0/std 1
    preserves β); `fused_light_pipeline` trims the padding off its output,
    so no consumer sees those lanes (ADVICE r4). The kernel DIVIDES by
    std (not multiply-by-reciprocal) so it is bit-identical to
    `normalize_images`."""
    rows = _rows_for(h, w)
    size = h * w * 3
    f = jnp.arange(rows * LANES)
    c = f % 3
    y = jnp.where(f < size, f // (w * 3), h).astype(jnp.int32)
    x = jnp.where(f < size, (f // 3) % w, w).astype(jnp.int32)
    mean = jnp.where(f < size, jnp.asarray(IMAGENET_MEAN)[c], 0.0)
    std = jnp.where(f < size, jnp.asarray(IMAGENET_STD)[c], 1.0)
    shape = (rows, LANES)
    return (y.reshape(shape), x.reshape(shape),
            mean.astype(jnp.float32).reshape(shape),
            std.astype(jnp.float32).reshape(shape))


def _gather_augment_kernel(idx_ref, pf_ref, pi_ref, ymap_ref, xmap_ref,
                           mean_ref, std_ref, ds_ref, out_ref,
                           scratch, sems, *, tile_b):
    i = pl.program_id(0)
    copies = []
    for j in range(tile_b):
        dma = pltpu.make_async_copy(
            ds_ref.at[idx_ref[i * tile_b + j]], scratch.at[j], sems.at[j]
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    x = scratch[:, :, :]                                  # (tb, R, 128)
    alpha = pf_ref[:, 0].reshape(tile_b, 1, 1)
    beta = pf_ref[:, 1].reshape(tile_b, 1, 1)
    x = jnp.clip(x * alpha + beta, 0.0, 1.0)

    yy = ymap_ref[:, :][None]
    xx = xmap_ref[:, :][None]
    y0 = pi_ref[:, 0].reshape(tile_b, 1, 1)
    y1 = pi_ref[:, 1].reshape(tile_b, 1, 1)
    x0 = pi_ref[:, 2].reshape(tile_b, 1, 1)
    x1 = pi_ref[:, 3].reshape(tile_b, 1, 1)
    hole = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
    x = jnp.where(hole, 0.0, x)

    out_ref[:, :, :] = (x - mean_ref[:, :][None]) / std_ref[:, :][None]


def _pick_tile(batch: int, tile_b: int) -> int:
    t = min(tile_b, batch)
    while batch % t:
        t -= 1
    return t


@functools.partial(
    jax.jit, static_argnames=("h", "w", "tile_b", "interpret")
)
def fused_light_pipeline(
    dataset2n: jnp.ndarray,   # (2N, R, 128) from prepare_gather_dataset
    idx_eff: jnp.ndarray,     # (B,) i32 — row index with flip folded in
    pf: jnp.ndarray,          # (B, 2) f32 [alpha, beta]
    pi: jnp.ndarray,          # (B, 4) i32 [y0, y1, x0, x1]
    *,
    h: int,
    w: int,
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One kernel: DMA-gather B rows, brightness/contrast FMA, cutout
    mask, ImageNet normalize. Returns (B, H, W, 3) float32."""
    batch = idx_eff.shape[0]
    rows = dataset2n.shape[1]
    assert rows == _rows_for(h, w), (rows, h, w)
    # VMEM cap: the kernel holds ~2 f32 tiles (DMA scratch + output block)
    # plus pipelining copies; cap the batch tile so they fit the ~16 MB
    # scoped VMEM with headroom (measured: tile 64 × 139 rows OOMs at
    # 16.61 MB on v5e for 77×77 images).
    vmem_rows_budget = (2 << 20) // (LANES * 4)  # 2 MB per f32 tile buffer
    tb = _pick_tile(batch, min(tile_b, max(1, vmem_rows_budget // rows)))
    ymap, xmap, mean, std = _coord_rows(h, w)

    full = lambda i, s: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_gather_augment_kernel, tile_b=tb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch // tb,),
            in_specs=[
                pl.BlockSpec((tb, 2), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 4), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANES), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANES), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANES), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, LANES), full, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # dataset stays in HBM
            ],
            out_specs=pl.BlockSpec((tb, rows, LANES), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tb, rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, rows, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ) if not interpret else None,
        interpret=interpret,
    )(idx_eff.astype(jnp.int32), pf, pi, ymap, xmap, mean, std, dataset2n)

    size = h * w * 3
    flat = out.reshape(batch, rows * LANES)
    if size != rows * LANES:
        flat = flat[:, :size]
    return flat.reshape(batch, h, w, 3)


def light_pipeline_reference(images: jnp.ndarray, idx: jnp.ndarray,
                             params_step: LightParams) -> jnp.ndarray:
    """Pure-jnp oracle for the kernel given the SAME drawn parameters:
    gather → flip → clip(x·α+β) → cutout rectangle → normalize. Used by
    tests to pin the fused kernel's math (to ≤1 FMA-contraction ulp)."""
    from nnue_vision_tpu.data.augment import normalize_images

    x = jnp.take(images, idx, axis=0)
    x = jnp.where(params_step.flip[:, None, None, None],
                  x[:, :, ::-1, :], x)
    alpha = params_step.pf[:, 0][:, None, None, None]
    beta = params_step.pf[:, 1][:, None, None, None]
    x = jnp.clip(x * alpha + beta, 0.0, 1.0)
    h, w = x.shape[1], x.shape[2]
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    pi = params_step.pi
    hole = (
        (yy >= pi[:, 0][:, None, None, None])
        & (yy < pi[:, 1][:, None, None, None])
        & (xx >= pi[:, 2][:, None, None, None])
        & (xx < pi[:, 3][:, None, None, None])
    )
    x = jnp.where(hole, 0.0, x)
    return normalize_images(x)
