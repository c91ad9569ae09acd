"""On-device augmentation: a fused, stateless XLA preprocessing graph.

The reference augments per-sample on the host with albumentations
(data/datasets.py:173-374 upstream) — CPU-bound and unjittable. Here the
whole batch is augmented on the TPU as one jitted function of
(rng, images): every transform is a branchless `jnp.where` blend driven by
per-sample Bernoulli draws, so the compiled graph is static and fuses into
the training step's input pipeline.

Tier parity (same transform families and probabilities as upstream):
  light : hflip(0.5), brightness/contrast ±0.1 (0.2), cutout 5% (0.2)
  medium: + rot90(0.5), rotate ±15° (0.3), affine translate ±10%/scale
          0.9–1.1 (0.3), brightness/contrast ±0.2 (0.3), HSV shift (0.3),
          blur 3x3 (0.2), gauss noise σ∈[0.01,0.05] (0.2), cutout 5–15%
          (0.3), color jitter (0.2)
  heavy : medium + a second aggressive pass (extra flip/rot90, rotate ±25°
          (0.2), affine ±15%/0.85–1.15, brightness ±0.3, stronger noise
          σ∈[0.05,0.1], cutout 10–25% ×2)

Upstream's low-probability exotics map to jit-able approximations at the
same probabilities: shadow → half-plane darkening, fog → white blend,
posterize → color-depth reduction, equalize/CLAHE → contrast stretch
(each p=0.1); grid-distortion/elastic are covered by the affine family.
Distributional coverage is tested, not pixel parity (SURVEY.md §7
hard-part 4).

Images are float32 [0,1] NHWC throughout; `normalize_images` applies the
ImageNet statistics at the end exactly like the upstream pipeline's
terminal `A.Normalize` (data/datasets.py:357-374 upstream).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

STRENGTHS = ("light", "medium", "heavy")


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std with ImageNet statistics; NHWC float in [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def _bernoulli(key, p, b):
    return jax.random.uniform(key, (b, 1, 1, 1)) < p


def _hflip(key, x, p):
    return jnp.where(_bernoulli(key, p, x.shape[0]), x[:, :, ::-1, :], x)


def _bilinear_gather(x, src_y, src_x):
    """Per-sample bilinear resample with zeros outside the frame.

    Same semantics as `jax.scipy.ndimage.map_coordinates(order=1,
    mode="constant", cval=0)` per channel, but expressed as FOUR flat
    `take_along_axis` gathers over the flattened spatial axis instead of
    vmapped multi-dimensional gathers — the multi-dim form lowers
    pathologically on TPU (measured ~220 ms for a 1024×32×32×3 batch on
    v5e; this form is the standard embedding-style batched gather XLA
    tiles well)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    flat = x.reshape(b, h * w, c)

    def corner(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        idx = (
            jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        ).reshape(b, h * w, 1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)
        return jnp.where(valid, v, 0.0)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


# --- composed geometry -------------------------------------------------- #
# All geometric transforms (flip / rot90 / rotate / affine) are expressed
# as per-sample inverse maps src = M·dst_c + v in CENTERED pixel coords
# (dst_c = dst − center), composed into ONE (M, v) pair, and realized by a
# SINGLE bilinear warp per batch. Sequential per-op warps cost one gather
# pass each (the binding resource on TPU: ~25 ms per 1024×32×32×3 pass);
# composing matrices costs b·(2×2) flops. Each op still draws its own
# Bernoulli gate and parameters — an un-applied op contributes identity.


def _mv_identity(b):
    return (
        jnp.tile(jnp.eye(2, dtype=jnp.float32), (b, 1, 1)),
        jnp.zeros((b, 2), jnp.float32),
    )


def _mv_compose(mv_prev, mv_new):
    """Append a transform applied AFTER the existing chain: the overall
    inverse map becomes prev ∘ new (sample through the newest op first)."""
    m1, v1 = mv_prev
    m2, v2 = mv_new
    return m1 @ m2, jnp.einsum("bij,bj->bi", m1, v2) + v1


def _mv_where(apply, mv, b):
    """Gate a transform by a per-sample boolean (identity when off)."""
    m, v = mv
    mi, vi = _mv_identity(b)
    a = apply.reshape(b, 1, 1)
    return jnp.where(a, m, mi), jnp.where(a.reshape(b, 1), v, vi)


def _geom_hflip(key, b, p):
    apply = jax.random.uniform(key, (b,)) < p
    m = jnp.tile(
        jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float32), (b, 1, 1)
    )
    return _mv_where(apply, (m, jnp.zeros((b, 2), jnp.float32)), b)


def _geom_rot90(key, b, p):
    """Exact 0/90/180/270° rotation matrices (no trig — integer entries,
    so the final warp lands exactly on grid points for square images)."""
    k_apply, k_choice = jax.random.split(key)
    apply = jax.random.uniform(k_apply, (b,)) < p
    choice = jax.random.randint(k_choice, (b,), 0, 4)
    # inverse maps matching jnp.rot90(x, k, (1, 2)) — out(yc,xc) =
    # in(xc,−yc) for k=1 — exact integer entries
    mats = jnp.asarray(
        [
            [[1.0, 0.0], [0.0, 1.0]],
            [[0.0, 1.0], [-1.0, 0.0]],
            [[-1.0, 0.0], [0.0, -1.0]],
            [[0.0, -1.0], [1.0, 0.0]],
        ],
        jnp.float32,
    )
    m = mats[choice]
    return _mv_where(apply, (m, jnp.zeros((b, 2), jnp.float32)), b)


def _geom_affine(key, b, p, max_deg, max_translate, scale_range, h, w):
    keys = jax.random.split(key, 5)
    apply = jax.random.uniform(keys[0], (b,)) < p
    deg = jax.random.uniform(keys[1], (b,), minval=-max_deg, maxval=max_deg)
    theta = deg * (jnp.pi / 180.0)
    tx = jax.random.uniform(
        keys[2], (b,), minval=-max_translate, maxval=max_translate
    ) * w
    ty = jax.random.uniform(
        keys[3], (b,), minval=-max_translate, maxval=max_translate
    ) * h
    sc = jax.random.uniform(
        keys[4], (b,), minval=scale_range[0], maxval=scale_range[1]
    )
    cos = jnp.cos(theta) / sc
    sin = jnp.sin(theta) / sc
    # inverse map: src_c = R(-θ)/s · (dst_c - t)  →  M·dst_c + (−M·t)
    m = jnp.stack(
        [jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], axis=1
    )
    t = jnp.stack([ty, tx], axis=-1)
    v = -jnp.einsum("bij,bj->bi", m, t)
    return _mv_where(apply, (m, v), b)


def _warp_gather(x, mv):
    """Apply one composed inverse map (M, v) with a single bilinear pass
    realized by flat gathers. Kept as the general-shape fallback; the
    matmul two-pass below is ~30× faster on TPU but needs H == W and a
    modest spatial extent (the one-hot tensors are O(B·H·W²))."""
    b, h, w, _ = x.shape
    m, v = mv
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_y = (
        m[:, 0, 0, None, None] * yy + m[:, 0, 1, None, None] * xx
        + v[:, 0, None, None] + cy
    )
    src_x = (
        m[:, 1, 0, None, None] * yy + m[:, 1, 1, None, None] * xx
        + v[:, 1, None, None] + cx
    )
    return _bilinear_gather(x, src_y, src_x)


def _lerp_rows_x(x, src_x):
    """Linear resample along the W axis via a one-hot matmul.

    x: (B, H, W, C); src_x: (B, H, Wo) absolute (uncentered) x coords.
    Returns (B, H, Wo, C) with zero fill outside [0, W): an out-of-range
    corner simply matches no one-hot column, so its weight row is zero —
    `mode="constant", cval=0` semantics for free.

    Why a matmul: per-element gathers (`take_along_axis`) lower to
    DMA-descriptor-latency-bound code on TPU — measured 32 ms for a
    1024×32×32×3 warp, 1000× its HBM bound (scripts/profile_heavy_aug.py).
    Building the (B, H, Wo, W) interpolation matrix costs one fused
    elementwise write and the contraction rides the MXU. Precision is
    HIGHEST so exact-integer coordinates (rot90 / flips / integer
    translations, weights exactly {0, 1}) reproduce the input bits."""
    w = x.shape[2]
    i0f = jnp.floor(src_x)
    fr = (src_x - i0f)[..., None]
    i0 = i0f.astype(jnp.int32)[..., None]
    iota = jnp.arange(w, dtype=jnp.int32)
    weights = (
        (iota == i0).astype(x.dtype) * (1.0 - fr)
        + (iota == i0 + 1).astype(x.dtype) * fr
    )
    return jnp.einsum(
        "bhow,bhwc->bhoc", weights, x,
        precision=jax.lax.Precision.HIGHEST,
    )


# Which warp realization `_warp` picks. "auto" resolves per call: the
# Pallas lane-gather kernel on TPU when the shape qualifies (square,
# W·C ≤ 128 — ~0.3 ms at 1024×32×32×3), else the one-hot-matmul two-pass
# (~6 ms), else the flat-gather single pass (~32 ms, any shape). Under a
# GSPMD mesh the training loop pins "xla" (pallas_call does not partition
# automatically); the multi-chip fused path shard_maps the kernel instead.
_WARP_IMPL = "auto"


def set_warp_impl(impl: str) -> None:
    """Pin the warp realization: "auto" | "pallas" | "matmul" | "gather".

    Clears the jit cache — callers of augment_batch bake the choice into
    their traces at trace time."""
    global _WARP_IMPL
    if impl not in ("auto", "pallas", "matmul", "gather"):
        raise ValueError(f"unknown warp impl: {impl}")
    _WARP_IMPL = impl
    jax.clear_caches()


def _warp_pallas_ok(h: int, w: int, c: int) -> bool:
    return h == w and w * c <= 128 and h % 8 == 0


# Which photometric realization the medium/heavy tiers use. "auto"
# resolves at trace time: the fused Pallas kernel
# (ops/photometric_kernel.py — the whole gated photometric chain in ONE
# kernel, 3 HBM passes instead of ~32) on TPU when the shape qualifies,
# else the unfused jnp chain. All randomness is drawn OUTSIDE the kernel
# by the same _draw helpers the unfused ops use, so both paths sample the
# identical augmentation distribution (tests/test_photometric_kernel.py).
_PHOTO_IMPL = "auto"


def set_photometric_impl(impl: str) -> None:
    """Pin the photometric realization: "auto" | "pallas" | "xla".

    Clears the jit cache — callers of augment_batch bake the choice into
    their traces at trace time."""
    global _PHOTO_IMPL
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown photometric impl: {impl}")
    _PHOTO_IMPL = impl
    jax.clear_caches()


def _to_rbg_key(key: jax.Array) -> jax.Array:
    """Bridge a threefry key into the TPU hardware-RNG (`rbg`) impl.

    One threefry split expands the 2 uint32 key words into 4; those four
    words ARE the rbg key. Measured free (0.578 vs 0.583 ms for a native
    rbg key on the round-5 draw probe). Accepts both raw `(2,) uint32`
    keys and typed threefry keys."""
    ks = jax.random.split(key, 2)
    data = ks if ks.dtype == jnp.uint32 else jax.random.key_data(ks)
    return jax.random.wrap_key_data(data.reshape(4), impl="rbg")


def _photo_use_pallas(h: int, w: int, c: int) -> bool:
    from nnue_vision_tpu.ops.photometric_kernel import photometric_ok

    if _PHOTO_IMPL == "xla" or not photometric_ok(h, w, c):
        return False
    if _PHOTO_IMPL == "pallas":
        return True
    return jax.devices()[0].platform == "tpu"


def _photometric_medium_fused(ks, x):
    """The medium photometric block (brightness/contrast → HSV → blur →
    noise → cutout → HSV → shadow → fog → posterize → equalize) as ONE
    Pallas kernel. Parameter draws are the same _draw calls (same keys,
    same shapes) as the unfused chain below — identical distribution."""
    from nnue_vision_tpu.ops.photometric_kernel import photometric_block

    b, h, w, _ = x.shape
    bc_a, bright, contr = _bc_draw(ks[4], b, 0.3, 0.2)
    h1_a, hue1, sat1, val1 = _hsv_draw(ks[5], b, 0.3, 10 / 255.0, 0.15, 10 / 255.0)
    bl_a = _bernoulli(ks[6], 0.2, b)
    nz_a, sigma, noise = _noise_draw(ks[7], b, x.shape, 0.2, (0.01, 0.05))
    ct_a, y0, hh, x0, ww = _cutout_draw(ks[8], b, h, w, 0.3, (0.05, 0.15))
    h2_a, hue2, sat2, val2 = _hsv_draw(ks[9], b, 0.2, 8 / 255.0, 0.1, 8 / 255.0)
    sh_a, theta, offset, dark = _shadow_draw(ks[20], b, 0.1)
    fg_a, amount = _fog_draw(ks[21], b, 0.1)
    po_a = _bernoulli(ks[22], 0.1, b)
    eq_a = _bernoulli(ks[23], 0.1, b)

    def f(v):
        return v.reshape(b).astype(jnp.float32)

    fparams = jnp.stack(
        [
            f(bc_a), f(bright), f(contr),
            f(h1_a), f(hue1), f(sat1), f(val1),
            f(bl_a),
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
    return photometric_block(
        x, noise, fparams, iparams, variant="medium",
        interpret=jax.devices()[0].platform != "tpu",
    )


def _photometric_heavy_fused(ks, x):
    """The heavy-extra photometric block as ONE Pallas kernel (same
    contract as _photometric_medium_fused)."""
    from nnue_vision_tpu.ops.photometric_kernel import photometric_block

    b, h, w, _ = x.shape
    bc_a, bright, contr = _bc_draw(ks[14], b, 0.2, 0.3)
    hv_a, hue, sat, val = _hsv_draw(ks[15], b, 0.2, 15 / 255.0, 0.2, 15 / 255.0)
    bl_a = _bernoulli(ks[16], 0.2, b)
    nz_a, sigma, noise = _noise_draw(ks[17], b, x.shape, 0.2, (0.05, 0.1))
    c1_a, y0a, hha, x0a, wwa = _cutout_draw(ks[18], b, h, w, 0.2, (0.1, 0.25))
    c2_a, y0b, hhb, x0b, wwb = _cutout_draw(ks[19], b, h, w, 0.2, (0.1, 0.25))

    def f(v):
        return v.reshape(b).astype(jnp.float32)

    fparams = jnp.stack(
        [
            f(bc_a), f(bright), f(contr),
            f(hv_a), f(hue), f(sat), f(val),
            f(bl_a),
            f(nz_a), f(sigma),
            f(c1_a), f(c2_a),
        ],
        axis=1,
    )
    iparams = jnp.stack(
        [y0a, hha, x0a, wwa, y0b, hhb, x0b, wwb], axis=1
    ).astype(jnp.int32)
    return photometric_block(
        x, noise, fparams, iparams, variant="heavy_extra",
        interpret=jax.devices()[0].platform != "tpu",
    )


def _warp(x, mv):
    """Apply one composed inverse map (M, v) as a two-pass resample
    (Catmull & Smith 1980): one horizontal linear pass, one vertical —
    realized as Mosaic lane-gathers (ops/warp_kernel.py) on TPU, or as
    batched one-hot matmuls on the MXU elsewhere (see `_lerp_rows_x`).

    The inverse map src = M·dst_c + v decomposes into
        tmp(yi, xo) = in(yi, q(yi, xo)),   q = (c/a)·yi + (d − cb/a)·xo + (f − ce/a)
        out(yo, xo) = tmp(p(yo, xo), xo),  p = a·yo + b·xo + e
    which requires |a| = |m00| bounded away from 0. Every geometric
    generator here (flip / rot90 / rotate / affine with isotropic scale)
    is conformal, so M = s·O with O orthogonal: after factoring out an
    optional axis swap (realized as a per-sample transpose blend, exact),
    |m00| ≥ s/√2 ≥ ~0.4 for the tier parameter ranges. Non-square inputs
    fall back to the single-pass gather.

    For fractional rotations the two-pass result differs from direct
    bilinear sampling (pass 2 blends rows that pass 1 sampled at slightly
    different x), the standard property of two-pass warping — equally
    valid resampling, same smoothness class. Exact-grid maps (rot90,
    flips, integer translations) are reproduced bit-exactly."""
    b, h, w, c = x.shape
    impl = _WARP_IMPL
    if impl == "auto":
        if _warp_pallas_ok(h, w, c) and jax.devices()[0].platform == "tpu":
            impl = "pallas"
        elif h == w and h * w * w <= 1 << 17:
            impl = "matmul"
        else:
            impl = "gather"
    if impl == "pallas" and _warp_pallas_ok(h, w, c):
        from nnue_vision_tpu.ops.warp_kernel import warp_bilinear

        return warp_bilinear(
            x, mv, interpret=jax.devices()[0].platform != "tpu"
        )
    if impl == "gather" or h != w or h * w * w > 1 << 17:
        # non-square (transpose blend undefined) or the one-hot tensors
        # would exceed ~0.5 GB at batch 1024 — take the gather path
        return _warp_gather(x, mv)
    m, v = mv
    # 1) factor out the axis swap: in2(y, x) = in(x, y) when the map has
    #    dominant off-diagonal mass; then in(p) = in2(P·p) with P the swap,
    #    so the effective (M, v) become (P·M, P·v) — row-swapped.
    swap = (jnp.abs(m[:, 0, 0]) + jnp.abs(m[:, 1, 1])) < (
        jnp.abs(m[:, 0, 1]) + jnp.abs(m[:, 1, 0])
    )
    x2 = jnp.where(swap[:, None, None, None], jnp.swapaxes(x, 1, 2), x)
    ms = jnp.where(swap[:, None, None], m[:, ::-1, :], m)
    vs = jnp.where(swap[:, None], v[:, ::-1], v)
    a = ms[:, 0, 0]
    bb = ms[:, 0, 1]
    cc = ms[:, 1, 0]
    d = ms[:, 1, 1]
    e = vs[:, 0]
    f = vs[:, 1]
    # guard against a pathological (non-conformal caller) map; conformal
    # tier maps never get near this clamp
    a = jnp.where(jnp.abs(a) < 1e-3, jnp.where(a < 0, -1e-3, 1e-3), a)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yg = jnp.arange(h, dtype=jnp.float32) - cy    # centered output rows
    xg = jnp.arange(w, dtype=jnp.float32) - cx    # centered output cols

    # pass 1 (horizontal): per-(sample, row) resample along x
    r = cc / a
    q = (
        r[:, None, None] * yg[None, :, None]
        + (d - r * bb)[:, None, None] * xg[None, None, :]
        + (f - r * e)[:, None, None]
    )
    tmp = _lerp_rows_x(x2, q + cx)

    # pass 2 (vertical): resample along y = resample the transposed rows
    p = (
        a[:, None, None] * yg[None, :, None]
        + bb[:, None, None] * xg[None, None, :]
        + e[:, None, None]
    )
    # p is indexed (b, yo, xo); transpose to (b, xo, yo) so the W-axis
    # resampler gathers along y, then transpose back.
    out_t = _lerp_rows_x(
        jnp.swapaxes(tmp, 1, 2), jnp.swapaxes(p, 1, 2) + cy
    )
    return jnp.swapaxes(out_t, 1, 2)


def _affine(key, x, p, max_deg, max_translate, scale_range):
    """Rotation+translation+scale via one inverse-warp bilinear resample.
    (Standalone form; the tiers compose several geometric ops into one
    warp instead — see augment_batch. Un-applied samples get the identity
    map, which the bilinear warp reproduces exactly.)"""
    b, h, w, _ = x.shape
    mv = _geom_affine(key, b, p, max_deg, max_translate, scale_range, h, w)
    return _warp(x, mv)


# Each photometric op is split into a _draw helper (all of its jax.random
# calls — same keys, same shapes) and the elementwise application. The
# fused Pallas photometric path (ops/photometric_kernel.py) calls the SAME
# _draw helpers and ships the results into one kernel, so the sampled
# augmentation distribution is structurally identical to the unfused
# chain (the ADVICE-r4 pin; tests/test_photometric_kernel.py).


def _bc_draw(key, b, p, limit):
    keys = jax.random.split(key, 3)
    apply = _bernoulli(keys[0], p, b)
    bright = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=-limit, maxval=limit)
    contr = 1.0 + jax.random.uniform(keys[2], (b, 1, 1, 1), minval=-limit, maxval=limit)
    return apply, bright, contr


def _brightness_contrast(key, x, p, limit):
    apply, bright, contr = _bc_draw(key, x.shape[0], p, limit)
    out = jnp.clip((x - 0.5) * contr + 0.5 + bright, 0.0, 1.0)
    return jnp.where(apply, out, x)


def _hsv_draw(key, b, p, hue_lim, sat_lim, val_lim):
    keys = jax.random.split(key, 4)
    apply = _bernoulli(keys[0], p, b)
    hue = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=-hue_lim, maxval=hue_lim)
    sat = 1.0 + jax.random.uniform(keys[2], (b, 1, 1, 1), minval=-sat_lim, maxval=sat_lim)
    val = 1.0 + jax.random.uniform(keys[3], (b, 1, 1, 1), minval=-val_lim, maxval=val_lim)
    return apply, hue, sat, val


def _apply_hsv(x, apply, hue, sat, val):
    luma = (0.299 * x[..., :1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])
    shifted = jnp.concatenate(
        [x[..., :1] + hue, x[..., 1:2], x[..., 2:3] - hue], axis=-1
    )
    out = jnp.clip((luma + (shifted - luma) * sat) * val, 0.0, 1.0)
    return jnp.where(apply, out, x)


def _hsv_shift(key, x, p, hue_lim, sat_lim, val_lim):
    """Approximate HSV jitter without a full RGB↔HSV round trip: hue via a
    small channel rotation, saturation via blend with luma, value via gain."""
    apply, hue, sat, val = _hsv_draw(key, x.shape[0], p, hue_lim, sat_lim, val_lim)
    return _apply_hsv(x, apply, hue, sat, val)


def _blur(key, x, p):
    """3x3 box/gaussian-ish blur (depthwise conv)."""
    b = x.shape[0]
    kernel = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, 3))
    blurred = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=3,
    )
    return jnp.where(_bernoulli(key, p, b), blurred, x)


def _noise_draw(key, b, shape, p, sigma_range):
    keys = jax.random.split(key, 3)
    apply = _bernoulli(keys[0], p, b)
    sigma = jax.random.uniform(
        keys[1], (b, 1, 1, 1), minval=sigma_range[0], maxval=sigma_range[1]
    )
    noise = jax.random.normal(keys[2], shape)
    return apply, sigma, noise


def _gauss_noise(key, x, p, sigma_range):
    apply, sigma, noise = _noise_draw(key, x.shape[0], x.shape, p, sigma_range)
    return jnp.where(apply, jnp.clip(x + noise * sigma, 0.0, 1.0), x)


def _posterize(key, x, p, bits=4):
    """Reduce color depth to `bits` levels per channel."""
    b = x.shape[0]
    levels = float(2 ** bits - 1)
    post = jnp.round(x * levels) / levels
    return jnp.where(_bernoulli(key, p, b), post, x)


def _equalize_approx(key, x, p):
    """Histogram-equalization approximation: per-image contrast stretch to
    the full [0,1] range (the jit-able stand-in for A.Equalize)."""
    b = x.shape[0]
    lo = x.min(axis=(1, 2, 3), keepdims=True)
    hi = x.max(axis=(1, 2, 3), keepdims=True)
    stretched = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    return jnp.where(_bernoulli(key, p, b), stretched, x)


def _shadow_draw(key, b, p):
    keys = jax.random.split(key, 4)
    apply = _bernoulli(keys[0], p, b)
    theta = jax.random.uniform(keys[1], (b, 1, 1), maxval=2 * jnp.pi)
    offset = jax.random.uniform(keys[2], (b, 1, 1), minval=-0.3, maxval=0.3)
    dark = jax.random.uniform(keys[3], (b, 1, 1, 1), minval=0.4, maxval=0.7)
    return apply, theta, offset, dark


def _apply_shadow(x, apply, theta, offset, dark):
    _, h, w, _ = x.shape
    yy = (jnp.arange(h)[None, :, None] / h) - 0.5
    xx = (jnp.arange(w)[None, None, :] / w) - 0.5
    side = (jnp.cos(theta) * xx + jnp.sin(theta) * yy) > offset
    shaded = jnp.where(side[..., None], x * dark, x)
    return jnp.where(apply, shaded, x)


def _shadow(key, x, p):
    """Random linear half-plane shadow (darken one side by 30-60%)."""
    apply, theta, offset, dark = _shadow_draw(key, x.shape[0], p)
    return _apply_shadow(x, apply, theta, offset, dark)


def _fog_draw(key, b, p):
    keys = jax.random.split(key, 2)
    apply = _bernoulli(keys[0], p, b)
    amount = jax.random.uniform(keys[1], (b, 1, 1, 1), minval=0.1, maxval=0.4)
    return apply, amount


def _fog(key, x, p):
    """Fog approximation: blend toward white with a random intensity."""
    apply, amount = _fog_draw(key, x.shape[0], p)
    fogged = x * (1.0 - amount) + amount
    return jnp.where(apply, fogged, x)


def _cutout_draw(key, b, h, w, p, size_range):
    keys = jax.random.split(key, 4)
    apply = _bernoulli(keys[0], p, b)
    frac = jax.random.uniform(
        keys[1], (b,), minval=size_range[0], maxval=size_range[1]
    )
    hh = jnp.maximum(1, (frac * h).astype(jnp.int32))
    ww = jnp.maximum(1, (frac * w).astype(jnp.int32))
    y0 = (jax.random.uniform(keys[2], (b,)) * (h - hh)).astype(jnp.int32)
    x0 = (jax.random.uniform(keys[3], (b,)) * (w - ww)).astype(jnp.int32)
    return apply, y0, hh, x0, ww


def _apply_cutout(x, apply, y0, hh, x0, ww):
    _, h, w, _ = x.shape
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    hole = (
        (yy >= y0[:, None, None]) & (yy < (y0 + hh)[:, None, None])
        & (xx >= x0[:, None, None]) & (xx < (x0 + ww)[:, None, None])
    )[..., None]
    return jnp.where(apply & hole, 0.0, x)


def _cutout(key, x, p, size_range):
    """One random rectangular hole per sample (CoarseDropout)."""
    b, h, w, _ = x.shape
    apply, y0, hh, x0, ww = _cutout_draw(key, b, h, w, p, size_range)
    return _apply_cutout(x, apply, y0, hh, x0, ww)


@functools.partial(jax.jit, static_argnames=("strength",))
def augment_batch(
    key: jax.Array, images: jnp.ndarray, strength: str = "medium"
) -> jnp.ndarray:
    """Apply one augmentation tier to a float [0,1] NHWC batch.

    Geometry (flip / rot90 / rotate / affine) is COMPOSED per block: every
    geometric op draws its own gate + parameters as before, but each
    tier block's maps multiply into one per-sample inverse map realized
    by a single warp (the Pallas lane-gather two-pass on TPU —
    ops/warp_kernel.py). The medium block warps once before the
    photometric chain; the heavy block's extra geometry warps once more
    AFTER the medium photometric block, preserving the reference op
    order (upstream heavy tier, data/datasets.py:258-307; ADVICE r4
    restored this — round 4 had folded both blocks into one
    pre-photometric warp, which silently exempted cutout/blur/noise/
    shadow/fog from the heavy geometry). Composition within a block also
    loses less information than chained resampling (one interpolation
    per block, not one per op). Photometric ops are elementwise and stay
    sequential; they fuse."""
    if strength not in STRENGTHS:
        raise ValueError(f"strength must be one of {STRENGTHS}")
    x = images
    b, h, w, _ = x.shape

    if strength == "light":
        ks = list(jax.random.split(key, 24))
        x = _hflip(ks[0], x, 0.5)
        x = _brightness_contrast(ks[1], x, 0.2, 0.1)
        x = _cutout(ks[2], x, 0.2, (0.05, 0.051))
        return x

    # The medium/heavy tiers make ~26 random draws (incl. two full-batch
    # normal noise tensors); under threefry those draws are ~1.2 ms of
    # the ~1.9 ms heavy-tier step at batch 1024 — more than all the image
    # arithmetic (docs/TRAIN_ROOFLINE.md round-5 breakdown). Bridge the
    # key into the TPU hardware RNG (`rbg`, XLA RngBitGenerator): draws
    # drop 0.83 → 0.58 ms and the bridge itself is free. Trade-off,
    # documented: rbg streams are not bit-stable across backends or
    # compiler versions (threefry is), so the medium/heavy realization
    # is backend-dependent — the distribution is unchanged, parity tests
    # compare both impls on one backend, and the golden pins cover the
    # CPU stream. The light tier stays on threefry: the anchor accuracy
    # cells train with it, and its three draws cost nothing.
    ks = list(jax.random.split(_to_rbg_key(key), 24))

    # -- geometry: compose the medium maps, warp once --------------------- #
    mv = _geom_hflip(ks[0], b, 0.5)
    mv = _mv_compose(mv, _geom_rot90(ks[1], b, 0.5))
    mv = _mv_compose(
        mv, _geom_affine(ks[2], b, 0.3, 15.0, 0.0, (1.0, 1.0001), h, w)
    )  # Rotate(15, .3)
    mv = _mv_compose(
        mv, _geom_affine(ks[3], b, 0.3, 15.0, 0.1, (0.9, 1.1), h, w)
    )  # Affine
    x = _warp(x, mv)

    # -- photometric: one fused Pallas kernel on TPU, else the jnp chain - #
    fused_photo = _photo_use_pallas(h, w, x.shape[3])
    if fused_photo:
        x = _photometric_medium_fused(ks, x)
    else:
        x = _brightness_contrast(ks[4], x, 0.3, 0.2)
        x = _hsv_shift(ks[5], x, 0.3, 10 / 255.0, 0.15, 10 / 255.0)
        x = _blur(ks[6], x, 0.2)
        x = _gauss_noise(ks[7], x, 0.2, (0.01, 0.05))
        x = _cutout(ks[8], x, 0.3, (0.05, 0.15))
        x = _hsv_shift(ks[9], x, 0.2, 8 / 255.0, 0.1, 8 / 255.0)  # ColorJitter approx
        x = _shadow(ks[20], x, 0.1)
        x = _fog(ks[21], x, 0.1)
        x = _posterize(ks[22], x, 0.1)
        x = _equalize_approx(ks[23], x, 0.1)

    if strength == "heavy":
        # the aggressive second pass runs AFTER the medium photometric
        # block — reference ordering (upstream heavy tier appends its
        # geometric transforms after the medium chain,
        # data/datasets.py:258-307 upstream; ADVICE r4). Its four
        # geometric draws compose into one additional warp.
        mv2 = _geom_hflip(ks[10], b, 0.1)
        mv2 = _mv_compose(mv2, _geom_rot90(ks[11], b, 0.1))
        mv2 = _mv_compose(
            mv2, _geom_affine(ks[12], b, 0.2, 25.0, 0.0, (1.0, 1.0001), h, w)
        )
        mv2 = _mv_compose(
            mv2, _geom_affine(ks[13], b, 0.2, 25.0, 0.15, (0.85, 1.15), h, w)
        )
        x = _warp(x, mv2)
        if fused_photo:
            x = _photometric_heavy_fused(ks, x)
        else:
            x = _brightness_contrast(ks[14], x, 0.2, 0.3)
            x = _hsv_shift(ks[15], x, 0.2, 15 / 255.0, 0.2, 15 / 255.0)
            x = _blur(ks[16], x, 0.2)
            x = _gauss_noise(ks[17], x, 0.2, (0.05, 0.1))
            x = _cutout(ks[18], x, 0.2, (0.1, 0.25))
            x = _cutout(ks[19], x, 0.2, (0.1, 0.25))
    return x


@functools.partial(jax.jit, static_argnames=("strength", "augment"))
def preprocess_batch(
    key: jax.Array,
    images: jnp.ndarray,
    strength: str = "medium",
    augment: bool = True,
) -> jnp.ndarray:
    """augment (train only) → normalize. The single device-side entry point
    the train/eval loops use; mirrors the upstream transform order
    (augmentations, then terminal Normalize)."""
    x = augment_batch(key, images, strength) if augment else images
    return normalize_images(x)
