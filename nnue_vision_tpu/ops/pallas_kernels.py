"""Pallas TPU kernels for the NNUE hot path.

One kernel runs the entire NNUE post-conv pipeline — conv epilogue
(truncating /scale + clamp) → threshold compare → feature-transformer
matmul (MXU) → int16 wraparound → clipped ReLU → pairwise interaction →
three dense layers → float logits + active-feature count. The XLA version
(ops/engine_sim.py) materializes the conv output, the (B, F) mask and the
(B, L1) accumulator in HBM between fusions; here every intermediate lives
in VMEM for the whole batch tile, so HBM traffic is one read of the raw
conv accumulator + the weights (resident across tiles) and one write of
the logits.

Two structural optimizations over a naive fusion (both measured wins on a
v5e):

* **Trimmed contraction.** The engine writes the conv output flat into a
  zero-filled grid²·C buffer (nnue_engine.cpp:679-683 upstream); when the
  conv output is smaller than the grid, the trailing `n_pad` features are
  the constant 0. Their effect is data-independent: if the threshold is
  negative they are all active, contributing `sum(ft_w[FR:])` to every
  accumulator and `n_pad` to every count; otherwise nothing. The kernel
  contracts over the FR real features only and adds the precomputed
  padding row-sum under a scalar flag — bit-identical, 800→512 less MXU
  and VMEM for the flagship config.

* **bf16 MXU feeds where exact.** A bf16 significand holds 8 bits, so
  integers with |v| ≤ 256 cast to bf16 exactly, products of two such
  values are exact in the MXU's f32 accumulation tree, and sums stay
  exact below 2^24. Pairwise/dense activations are clamped to [0,127] and
  dense weights are int8 by format, so those dots always qualify; the FT
  dot qualifies whenever max|ft_w| ≤ 256 (every model this framework
  serializes clips weights to ±1 at scale 64 → |w| ≤ 64; checked at
  parameter-build time with an f32 fallback for foreign files).

Bit-exactness contract is identical to ops/engine_sim.py (same integer
semantics, computed in integer-valued f32 where exact, int32 where
wraparound matters), asserted in tests/test_pallas_kernels.py and — via
engine_sim's own parity suite — against the C++ engine binaries.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnue_vision_tpu.ops.engine_sim import (
    NNUESimCfg,
    _int_conv3x3,
    _quantize_input,
    engine_conv_stride,
)

# integers with |v| <= _BF16_EXACT cast to bfloat16 without rounding
# (8 significand bits incl. the implicit one; 257 is the first that rounds)
_BF16_EXACT = 256.0


def _wrap_i16_i32(x: jnp.ndarray) -> jnp.ndarray:
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def _head_body(
    x,             # (TILE_B, FR) f32 — int-valued conv accumulator or buffer
    thresh_ref,    # (1, 1) f32 SMEM
    padsum_ref,    # (1, L1) f32 — sum of FT rows for the n_pad zero features
    ft_w_ref,      # (FR, L1) f32 or bf16
    ft_b_ref,      # (1, L1) f32
    fc1_w_ref,     # (L1, L2) bf16
    fc1_b_ref,     # (1, L2) f32
    fc2_w_ref,     # (L2, L3) bf16
    fc2_b_ref,     # (1, L3) f32
    out_w_ref,     # (L3, C) bf16
    out_b_ref,     # (1, C) f32
    logits_ref,    # (TILE_B, C) f32
    count_ref,     # (TILE_B, 8) i32 (count broadcast; col 0 read) or None
    *,
    l1: int,
    qone: int,
    s1: int,
    s2: int,
    out_scale: float,
    conv_scale: int,
    n_pad: int,
):
    """Shared post-conv pipeline: epilogue → threshold → FT → dense stack.

    `x` is the already-loaded int-valued accumulator tile; writes logits
    (and optionally the active-feature count) into the output refs.
    """
    if conv_scale != 1:
        # conv epilogue (nnue_engine.cpp:92): truncating /scale, clamp ±127.
        # Exact: the scale is a power of two, so x/scale is exact in f32 and
        # jnp.trunc rounds toward zero like C integer division.
        x = jnp.clip(jnp.trunc(x * (1.0 / conv_scale)), -127.0, 127.0)

    thr = thresh_ref[0, 0]
    mask = x > thr
    # the n_pad zero-valued padding features are active iff 0 > threshold
    pad_active = (0.0 > thr).astype(jnp.float32)
    if count_ref is not None:
        count_ref[:] = jnp.broadcast_to(
            (
                mask.sum(axis=1, keepdims=True).astype(jnp.float32)
                + pad_active * np.float32(n_pad)
            ).astype(jnp.int32),
            count_ref.shape,
        )

    # FT accumulate on the MXU; exact (≤ F·max|w| + bias < 2^24), then int16
    # wraparound + clipped ReLU (engine semantics).
    ft = jnp.dot(
        mask.astype(ft_w_ref.dtype),
        ft_w_ref[:],
        preferred_element_type=jnp.float32,
    )
    ft = ft + ft_b_ref[:] + pad_active * padsum_ref[:]
    ft = _wrap_i16_i32(ft.astype(jnp.int32))
    ft = jnp.clip(ft, 0, qone).astype(jnp.float32)

    # pairwise: trunc((a*b)/128) clamp [0,127]; concat with clamp(a).
    # Values ≤ 127 → exact bf16 feeds for the dense stack.
    half = l1 // 2
    a = ft[:, :half]
    b = ft[:, half:]
    prod = jnp.clip(jnp.trunc(a * b * (1.0 / 128.0)), 0.0, 127.0)
    pairwise = jnp.concatenate(
        [prod, jnp.clip(a, 0.0, 127.0)], axis=1
    ).astype(fc1_w_ref.dtype)

    # fc1: trunc(acc / s1) clamp [0,127]  (s1 is a power of two → exact).
    h1 = jnp.dot(pairwise, fc1_w_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.clip(jnp.trunc((h1 + fc1_b_ref[:]) * (1.0 / s1)), 0.0, 127.0)

    # fc2: trunc(acc / s2) clamp ±127 then ReLU.
    h2 = jnp.dot(
        h1.astype(fc2_w_ref.dtype), fc2_w_ref[:],
        preferred_element_type=jnp.float32,
    )
    h2 = jnp.clip(jnp.trunc((h2 + fc2_b_ref[:]) * (1.0 / s2)), -127.0, 127.0)
    h2 = jnp.maximum(h2, 0.0)

    # output layer: float logits acc / out_scale.
    out = jnp.dot(
        h2.astype(out_w_ref.dtype), out_w_ref[:],
        preferred_element_type=jnp.float32,
    )
    logits_ref[:] = (out + out_b_ref[:]) * np.float32(1.0 / out_scale)


def _head_kernel(acc_ref, *refs, **kw):
    """Head-only kernel: accumulator tile arrives precomputed from HBM."""
    _head_body(acc_ref[:], *refs, **kw)


def _mega_kernel(
    img_ref,       # (TILE_B, H·W·3) f32 raw image — or bf16 pre-quantized
    wfull_ref,     # (H·W·3, FR) bf16 — conv lifted to a dense matrix
    cbias_ref,     # (1, FR) f32 — conv bias broadcast per feature
    *refs,
    in_scale: float,
    prequantized: bool = False,
    **kw,
):
    """Whole-pipeline kernel: input quantization + conv-as-matmul + head.

    The 3×3 strided conv is expressed as one dense (H·W·3, FR) matmul
    (`conv_as_matrix`): each output feature reads ≤27 input values, the
    rest of its matrix column is zero. The ~100× FLOP padding is free on
    the MXU at this size — the matmul lands the conv accumulator directly
    in lane-major (TILE_B, FR) registers, eliminating the XLA relayout of
    the 4-D NHWC conv output into the packed kernel operand that capped
    the composed conv+head pipeline at ~58% of its stage bound.

    Exactness: quantized inputs trunc(x·scale) are integers; the kernel
    requires |qx| ≤ 256 (callers assert via `conv_inputs_bf16_safe`) so
    the bf16 cast and MXU f32 accumulation are exact, matching
    `_quantize_input` + `_int_conv3x3` bit for bit.
    """
    if prequantized:
        # input is already trunc(x·scale) as integer-valued bf16 (half
        # the HBM read of the f32 path — the pipeline is input-BW-bound)
        qx = img_ref[:]
    else:
        qx = jnp.trunc(img_ref[:] * np.float32(in_scale)).astype(jnp.bfloat16)
    acc = jnp.dot(qx, wfull_ref[:], preferred_element_type=jnp.float32)
    _head_body(acc + cbias_ref[:], *refs, **kw)


def conv_as_matrix(
    conv_w: np.ndarray,  # (C_out, 3, 3, 3) int-valued, OIHW
    conv_b: np.ndarray,  # (C_out,) int-valued
    image_h: int,
    image_w: int,
    stride: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Lift the engine's 3×3 pad-1 strided conv to a dense matrix.

    Returns (W_full (H·W·3, FR) f32, bias_row (1, FR) f32) such that
    `img_flat @ W_full + bias_row` equals the flat NHWC int32 conv
    accumulator of `_int_conv3x3` (nnue_engine.cpp:48-157 semantics);
    feature index f = (i·ow + j)·C + c, input index v = (h·W + w)·3 + cin
    — exactly the layouts of the engine's conv buffer and its flat
    float input (nnue_inference.cpp:23-30).
    """
    conv_w = np.asarray(conv_w, np.float32)
    conv_b = np.asarray(conv_b, np.float32)
    c_out = conv_w.shape[0]
    oh = (image_h + 2 - 3) // stride + 1
    ow = (image_w + 2 - 3) // stride + 1
    fr = oh * ow * c_out
    wfull = np.zeros((image_h * image_w * 3, fr), np.float32)
    for i in range(oh):
        for j in range(ow):
            for kh in range(3):
                h = i * stride + kh - 1
                if h < 0 or h >= image_h:
                    continue
                for kw in range(3):
                    w = j * stride + kw - 1
                    if w < 0 or w >= image_w:
                        continue
                    for cin in range(3):
                        v = (h * image_w + w) * 3 + cin
                        base = (i * ow + j) * c_out
                        wfull[v, base:base + c_out] = conv_w[:, cin, kh, kw]
    bias_row = np.broadcast_to(conv_b, (oh * ow, c_out)).reshape(1, fr)
    return wfull, np.ascontiguousarray(bias_row, np.float32)


def pallas_head_params(sim_params: Dict) -> Dict:
    """Re-layout engine-sim params for the fused kernel.

    Dense weights transpose to (in, out) and cast to bf16 (int8 values are
    always bf16-exact); the FT table casts to bf16 only when its values
    fit the bf16 exact-integer window (|v| ≤ 256), else stays f32 (slower
    multi-pass MXU but still bit-exact). Biases stay f32, 2-D for TPU
    layout.
    """
    ft_w = sim_params["ft_w"].astype(jnp.float32)
    ft_max = float(jnp.max(jnp.abs(ft_w)))
    return {
        "thresh": sim_params["visual_threshold"].reshape(1, 1),
        "ft_w": ft_w.astype(jnp.bfloat16) if ft_max <= _BF16_EXACT else ft_w,
        "ft_b": sim_params["ft_b"].astype(jnp.float32).reshape(1, -1),
        "fc1_w": sim_params["fc1_w"].astype(jnp.bfloat16).T,
        "fc1_b": sim_params["fc1_b"].astype(jnp.float32).reshape(1, -1),
        "fc2_w": sim_params["fc2_w"].astype(jnp.bfloat16).T,
        "fc2_b": sim_params["fc2_b"].astype(jnp.float32).reshape(1, -1),
        "out_w": sim_params["out_w"].astype(jnp.bfloat16).T,
        "out_b": sim_params["out_b"].astype(jnp.float32).reshape(1, -1),
    }


def _pipeline_call(
    kernel_base,
    lead_arrays,      # [acc] or [images_flat, wfull, cbias]; [0] is batched
    lead_specs,       # BlockSpecs for lead_arrays (batched first)
    head_params: Dict,
    *,
    cfg: NNUESimCfg,
    fr: int,
    n_pad: int,
    conv_scale: int,
    tile_b: int,
    interpret: bool,
    with_count: bool,
):
    """Shared plumbing for both fused pipelines: pow2-scale guard,
    padding-features constant, batch tiling/padding, the 10 head-weight
    BlockSpecs, output spec/count handling, and the pallas_call itself.
    `lead_specs` must be built with the clamped tile size from
    `_clamp_tile` (the batched spec's block shape depends on it)."""
    b = lead_arrays[0].shape[0]
    l1 = cfg.l1

    if conv_scale != 1 and (conv_scale <= 0 or conv_scale & (conv_scale - 1)):
        raise ValueError(
            f"conv scale {conv_scale} is not a power of two; the fused "
            "kernel's in-VMEM truncating division requires pow2 scales"
        )

    # the padding features' constant FT contribution (active iff thresh < 0)
    ft_w = head_params["ft_w"]
    ft_w_real = ft_w[:fr]
    if n_pad:
        padsum = jnp.sum(
            ft_w[fr:].astype(jnp.float32), axis=0, keepdims=True
        )
    else:
        padsum = jnp.zeros((1, l1), jnp.float32)

    tile_b = _clamp_tile(tile_b, b)
    pad_b = (-b) % tile_b
    lead = list(lead_arrays)
    if pad_b:
        lead[0] = jnp.pad(lead[0], ((0, pad_b), (0, 0)))
    bp = lead[0].shape[0]

    kernel = functools.partial(
        kernel_base,
        l1=l1,
        qone=cfg.quantized_one,
        s1=cfg.fc1_scale,
        s2=cfg.fc2_scale,
        out_scale=cfg.out_scale,
        conv_scale=conv_scale,
        n_pad=n_pad,
    )

    n_tiles = bp // tile_b
    full = lambda *_: (0, 0)  # noqa: E731 — whole-array blocks each step
    out_specs = [
        pl.BlockSpec((tile_b, cfg.num_classes), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((bp, cfg.num_classes), jnp.float32)]
    if with_count:
        # 8 lanes (one i32 sublane tile) instead of a full 128-lane row:
        # at serving batch the count write is bandwidth, not compute.
        out_specs.append(
            pl.BlockSpec((tile_b, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((bp, 8), jnp.int32))
    else:
        kernel = functools.partial(kernel, count_ref=None)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            *lead_specs,
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, l1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((fr, l1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, cfg.l2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.l2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.l2, cfg.l3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.l3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.l3, cfg.num_classes), full,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.num_classes), full, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        # default scoped-vmem budget is 16MB; the largest working set
        # (image tile + resident conv matrix + f32 FT intermediate +
        # weights) needs more. Batch tiles are independent → parallel.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(
        *lead,
        head_params["thresh"],
        padsum,
        ft_w_real,
        head_params["ft_b"],
        head_params["fc1_w"],
        head_params["fc1_b"],
        head_params["fc2_w"],
        head_params["fc2_b"],
        head_params["out_w"],
        head_params["out_b"],
    )
    if with_count:
        logits, count = outs
        return logits[:b], count[:b, 0]
    return outs[0][:b], None


def _clamp_tile(tile_b: int, b: int) -> int:
    return min(tile_b, max(8, b))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "fr", "n_pad", "conv_scale", "tile_b", "interpret",
                     "with_count"),
)
def _fused_head_call(
    head_params: Dict,
    acc: jnp.ndarray,  # (B, FR) f32, int-valued
    *,
    cfg: NNUESimCfg,
    fr: int,
    n_pad: int,
    conv_scale: int,
    tile_b: int,
    interpret: bool,
    with_count: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # NOTE: passing the conv output in its native 4-D NHWC layout and
    # reshaping in-kernel was tried to skip the XLA-side relayout into a
    # packed (B, FR) operand — Mosaic rejects the cross-lane register
    # reshape (remote-compile 500); the megafused path removes the
    # relayout differently (conv-as-matmul from the flat image).
    tb = _clamp_tile(tile_b, acc.shape[0])
    return _pipeline_call(
        _head_kernel,
        [acc],
        [pl.BlockSpec((tb, fr), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        head_params,
        cfg=cfg, fr=fr, n_pad=n_pad, conv_scale=conv_scale, tile_b=tile_b,
        interpret=interpret, with_count=with_count,
    )


def mega_head_params(
    sim_params: Dict, cfg: NNUESimCfg, image_h: int, image_w: int
) -> Dict:
    """Head params + the conv-as-matrix operands for the megafused kernel."""
    stride = engine_conv_stride(image_h, cfg.grid_size)
    wfull, cbias = conv_as_matrix(
        np.asarray(sim_params["conv_w"]),
        np.asarray(sim_params["conv_b"]),
        image_h, image_w, stride,
    )
    if wfull.size * 2 > 48 * 1024 * 1024:
        raise ValueError(
            f"conv-as-matrix operand ({wfull.shape}) exceeds the VMEM "
            "budget for the megafused kernel; use "
            "nnue_engine_forward_fused for this image size"
        )
    if float(np.max(np.abs(wfull))) > _BF16_EXACT:
        raise ValueError("conv weights exceed the bf16 exact-integer window")
    params = pallas_head_params(sim_params)
    params["conv_wfull"] = jnp.asarray(wfull, jnp.bfloat16)
    params["conv_bias_row"] = jnp.asarray(cbias, jnp.float32)
    return params


def quantize_images_for_mega(images_flat: np.ndarray, cfg) -> np.ndarray:
    """Host-side pre-quantization for `input_mode="qbf16"` serving:
    trunc(x·conv_scale) as integer-valued bfloat16 — bit-identical input
    to the kernel's own quantize (|qx| ≤ 256 precondition applies), at
    half the HBM read. numpy in/out (ml_dtypes bfloat16)."""
    import ml_dtypes

    q = np.trunc(np.asarray(images_flat, np.float32) * np.float32(cfg.conv_scale))
    if np.max(np.abs(q)) > _BF16_EXACT:
        raise ValueError(
            "pre-quantized inputs exceed the bf16 exact-integer window "
            "(|qx| > 256) — use the f32 input mode"
        )
    return q.astype(ml_dtypes.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_h", "image_w", "interpret",
                              "tile_b", "with_count", "input_mode")
)
def nnue_engine_forward_mega(
    head_params: Dict,
    images_flat: jnp.ndarray,  # (B, H·W·3) f32, flat HWC (engine .bin order)
    *,
    cfg: NNUESimCfg,
    image_h: int,
    image_w: int,
    tile_b: int = 512,
    interpret: bool = False,
    with_count: bool = True,
    input_mode: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-kernel bit-exact NNUE int8 inference: image in, logits out.

    The entire pipeline of `/root/reference/engine/src/nnue_engine.cpp:659-734`
    — input quantization, 3×3 strided conv (as one dense MXU matmul, see
    `_mega_kernel`), epilogue, threshold, feature transformer, pairwise,
    dense stack — runs in one Pallas kernel; no intermediate ever touches
    HBM. Input arrives flat (B, H·W·3), the same layout the engine CLI
    reads from its `.bin` files (nnue_inference.cpp:23-30), so serving
    needs no device-side relayout at all.

    Precondition (asserted by callers on host data via
    `conv_inputs_bf16_safe`): every |trunc(x·conv_scale)| ≤ 256, which
    production-normalized images satisfy with ~30% margin.

    input_mode="qbf16": `images_flat` is ALREADY trunc(x·scale) as
    integer-valued bf16 (see `quantize_images_for_mega`) — same bits out,
    half the input HBM traffic (the binding resource: the f32 pipeline is
    ~73% input DMA, scripts/profile_mega_bisect.py).
    """
    b = images_flat.shape[0]
    params = head_params
    fr = params["conv_wfull"].shape[1]
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    n_pad = num_features - fr
    if n_pad < 0:
        raise ValueError("conv output exceeds feature grid — invalid config")
    if input_mode not in ("f32", "qbf16"):
        raise ValueError(f"unknown input_mode {input_mode!r}")
    hw3 = images_flat.shape[1]

    kernel = functools.partial(
        _mega_kernel,
        in_scale=float(cfg.conv_scale),
        prequantized=(input_mode == "qbf16"),
    )
    tb = _clamp_tile(tile_b, b)
    full = lambda *_: (0, 0)  # noqa: E731
    logits, count = _pipeline_call(
        kernel,
        [images_flat, params["conv_wfull"], params["conv_bias_row"]],
        [
            pl.BlockSpec((tb, hw3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw3, fr), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fr), full, memory_space=pltpu.VMEM),
        ],
        params,
        cfg=cfg, fr=fr, n_pad=n_pad, conv_scale=cfg.conv_scale,
        tile_b=tile_b, interpret=interpret, with_count=with_count,
    )
    if with_count:
        density = count.astype(jnp.float32) / np.float32(num_features)
        return logits, density, count
    return logits, None, None


def fused_nnue_head(
    head_params: Dict,
    conv_buf: jnp.ndarray,  # (B, F) f32, int-valued (padded grid buffer)
    *,
    cfg: NNUESimCfg,
    tile_b: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logits (B, C) f32, active_count (B,) i32) — bit-exact engine head.

    Takes the already-clipped, zero-padded grid buffer (the engine's
    post-conv state); contraction runs over all F features. Prefer
    `nnue_engine_forward_fused`, which feeds the raw conv accumulator and
    trims the padding columns out of the matmul.
    """
    f = conv_buf.shape[1]
    return _fused_head_call(
        head_params, conv_buf, cfg=cfg, fr=f, n_pad=0, conv_scale=1,
        tile_b=tile_b, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_h", "image_w", "interpret",
                              "tile_b", "with_count", "conv_mode")
)
def nnue_engine_forward_fused(
    sim_params: Dict,
    head_params: Dict,
    images: jnp.ndarray,
    *,
    cfg: NNUESimCfg,
    image_h: int,
    image_w: int,
    tile_b: int = 1024,
    interpret: bool = False,
    with_count: bool = True,
    conv_mode: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full bit-exact NNUE int8 inference with the Pallas fused head.

    Same contract as engine_sim.nnue_engine_forward: (logits, density,
    active_count). The conv frontend stays on the XLA conv unit (f32 —
    exact for any input below the 2^24 integer window, no input-range
    precondition); the raw int-valued accumulator feeds the kernel, which
    owns the epilogue, threshold, padding constant, and the whole head.
    with_count=False skips the density/count compute and HBM write for
    logits-only serving; (logits, None, None) is returned.
    """
    stride = engine_conv_stride(image_h, cfg.grid_size)
    qin = _quantize_input(images, cfg.conv_scale)
    acc = _int_conv3x3(
        qin, sim_params["conv_w"], sim_params["conv_b"], stride,
        bf16=(conv_mode == "bf16"),
    ).astype(jnp.float32)

    b = acc.shape[0]
    fr = acc.shape[1] * acc.shape[2] * acc.shape[3]
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    n_pad = num_features - fr
    if n_pad < 0:
        raise ValueError("conv output exceeds feature grid — invalid config")

    logits, count = _fused_head_call(
        head_params, acc.reshape(b, fr), cfg=cfg, fr=fr, n_pad=n_pad,
        conv_scale=cfg.conv_scale, tile_b=tile_b, interpret=interpret,
        with_count=with_count,
    )
    if not with_count:
        return logits, None, None
    density = count.astype(jnp.float32) / sim_params["num_features_f32"]
    return logits, density, count
