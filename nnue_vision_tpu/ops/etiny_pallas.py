"""Pallas TPU kernel for the EtinyNet LB/DLB block — measured experiment.

One kernel runs an entire linear-depthwise block — pw-expand matmul (MXU)
→ truncating requant + ReLU6 → depthwise 3×3 (nine shifted VPU
multiply-accumulates) → requant + ReLU6 → pw-project matmul (MXU) →
requant + clamp — with every intermediate resident in VMEM for the batch
tile, one launch and one HBM round-trip per block instead of the XLA
path's ~4 fused kernels.

**Measured verdict: XLA wins — keep `etiny_engine_forward` as the
EtinyNet TPU serving path.** On a v5e (scripts/profile_etiny_pallas.py,
bench.py's chained-readback timing, bit-exactness asserted first):

    micro @ 32px, batch 2048:  XLA 4.92M img/s   Pallas 0.81M  (6.0×)
    1.0   @ 32px, batch 1024:  XLA 1.27M img/s   Pallas 0.54M  (2.4×)
    (tile size swept 4k/16k/32k rows — flat, so not grid overhead)

Two structural costs the fusion cannot buy back: (a) the depthwise taps
run on the VPU over 128-lane registers of which only C ∈ [8, 32] lanes
are live for micro (XLA's depthwise kernels pick layouts matched to tiny
channel counts), and (b) the stride-1 formulation (below) computes 4× the
positions on half the blocks. EtinyNet's fusion-addressable HBM traffic
is also small: activations are ≤ a few MB/batch vs NNUE's 98%-of-traffic
input read that made the megafused NNUE kernel win. This is the
framework's "don't hand-schedule what the compiler already does" data
point; the kernel stays as a tested, bit-exact experimental path and the
rejection evidence for ROADMAP #10.

Bit-exactness contract is identical to `etiny_engine_forward` (which is
itself verified bit-exact against the C++ `etinynet_inference` binary,
nnue_engine.cpp:1318-1419 semantics): integer-valued f32 arithmetic,
exact because every accumulator stays below 2^24 (bounds in
engine_sim.etiny_engine_forward's docstring), truncating division by
power-of-two scales, ReLU6 as clamp[0,6] (nnue_engine.cpp:906-973).

Design notes (TPU-first):

* **Row layout, no in-kernel reshapes.** Activations travel as 2-D
  (B·H·W, C) row-major — rows are (image, position) pairs, lanes are
  channels — prepared by XLA outside the kernel. Mosaic rejects
  cross-lane register reshapes (see ops/pallas_kernels.py), so the
  kernel never reshapes; pointwise convs are plain 2-D matmuls over the
  lane (channel) axis.

* **Depthwise 3×3 as shifted rows.** With the row layout, the neighbor
  at (di, dj) of output position p = i·W + j is the row p + di·W + dj —
  a static sublane shift (slice + zero concat). Image-boundary taps are
  masked with comparisons on a row iota (H, W powers of two → the
  i/j decomposition is shifts and ands, all VPU ops).

* **Strides run at stride 1.** pw-expand is positionwise, the dw conv at
  stride 2 computes a subset of the stride-1 outputs, and pw-project is
  positionwise again — so the whole block is computed at stride 1 and
  the caller subsamples the output rows (one tiny XLA strided slice
  between kernels). 4× extra FLOPs on tensors this small are free; in
  exchange the kernel needs no strided VMEM access (which Mosaic may
  reject) and one code path covers both strides.

* **bf16 MXU feeds where exact.** int8 weights and clamped activations
  (|v| ≤ 127, products ≤ 127·127, sums < 2^24) are inside the bf16
  exact-integer window (see ops/pallas_kernels._BF16_EXACT), so both
  pointwise matmuls feed the MXU in bf16 with exact f32 accumulation.

The stem conv, global pool, classifier, and the DLB dim-preservation
quirk stay in XLA: each is a single already-fused launch on tensors the
quirk path may reshape dynamically. Models whose dense blocks have
stride 2 (the engine's scrambling quirk case, which our serializer never
emits — models/etinynet.py tags those as plain LB) fall back to the XLA
sim; `etiny_forward_pallas` raises so callers can dispatch.
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
    EtinySimCfg,
    _dot_i8,
    _tdiv,
)


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _shift_rows(x: jnp.ndarray, o: int) -> jnp.ndarray:
    """shifted[r] = x[r + o], zero-filled outside [0, R) (static o)."""
    if o == 0:
        return x
    r = x.shape[0]
    z = jnp.zeros((abs(o), x.shape[1]), x.dtype)
    if o > 0:
        return jnp.concatenate([x[o:], z], axis=0)
    return jnp.concatenate([z, x[: r + o]], axis=0)


def _lb_block_kernel(
    x_ref,      # (RB, Cin) f32, int-valued in [-127, 127]
    we_ref,     # (Cin, Cmid) bf16 — pw-expand, (in, mid)
    be_ref,     # (1, Cmid) f32 — pw-expand bias
    dw_ref,     # (16, Cmid) f32 — dw taps, row t = tap (t//3, t%3); 9 used
    wp_ref,     # (Cmid, Cout) bf16 — pw-project, (mid, out)
    out_ref,    # (RB, Cout) f32 — stride-1 block output
    *,
    h: int,
    w: int,
    s_expand: int,
    s_dw: int,
    s_project: int,
):
    hw = h * w
    log2w = w.bit_length() - 1

    # pw-expand + ReLU6 (nnue_engine.cpp:906-924): exact bf16 MXU dot
    # (|x| ≤ 127, |w| ≤ 127, acc < 2^24), f32 bias, truncating /scale.
    acc = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), we_ref[:],
        preferred_element_type=jnp.float32,
    )
    hmid = jnp.clip(
        jnp.trunc((acc + be_ref[:]) * np.float32(1.0 / s_expand)), 0.0, 6.0
    )

    # depthwise 3×3 pad-1 (cpp:927-952) as nine shifted rows. Row index
    # decomposition needs H, W powers of two (callers guarantee).
    rb, cmid = hmid.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (rb, cmid), 0)
    i = (r & (hw - 1)) >> log2w
    j = r & (w - 1)
    acc = jnp.zeros((rb, cmid), jnp.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            tap = (di + 1) * 3 + (dj + 1)
            shifted = _shift_rows(hmid, di * w + dj)
            contrib = shifted * dw_ref[tap : tap + 1, :]
            valid = None
            if di != 0:
                valid = (i >= 1) if di < 0 else (i < h - 1)
            if dj != 0:
                jv = (j >= 1) if dj < 0 else (j < w - 1)
                valid = jv if valid is None else (valid & jv)
            if valid is not None:
                contrib = jnp.where(valid, contrib, 0.0)
            acc = acc + contrib
    hdw = jnp.clip(jnp.trunc(acc * np.float32(1.0 / s_dw)), 0.0, 6.0)

    # pw-project, no bias (cpp:955-973): exact bf16 dot (|h| ≤ 6).
    acc = jnp.dot(
        hdw.astype(jnp.bfloat16), wp_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.clip(
        jnp.trunc(acc * np.float32(1.0 / s_project)), -127.0, 127.0
    )


# Target rows per batch tile: bounds the kernel's VMEM working set
# (intermediates are (rows, C≤1280) f32) while keeping tiles MXU-sized.
_ROWS_TARGET = 4096


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "s_expand", "s_dw", "s_project", "interpret",
                     "rows_target"),
)
def lb_block_pallas(
    x_rows: jnp.ndarray,   # (B·H·W, Cin) f32 int-valued
    we: jnp.ndarray,       # (Cin, Cmid) bf16
    be: jnp.ndarray,       # (1, Cmid) f32
    dw16: jnp.ndarray,     # (16, Cmid) f32
    wp: jnp.ndarray,       # (Cmid, Cout) bf16
    *,
    h: int,
    w: int,
    s_expand: int,
    s_dw: int,
    s_project: int,
    interpret: bool = False,
    rows_target: int = _ROWS_TARGET,
) -> jnp.ndarray:
    """One fused LB block at stride 1 on the row layout; returns
    (B·H·W, Cout) f32. Caller subsamples rows for stride-2 blocks."""
    hw = h * w
    rows = x_rows.shape[0]
    b = rows // hw
    tile_b = max(1, min(b, max(1, rows_target // hw)))
    pad_b = (-b) % tile_b
    if pad_b:
        x_rows = jnp.pad(x_rows, ((0, pad_b * hw), (0, 0)))
    rb = tile_b * hw
    n_tiles = (b + pad_b) // tile_b

    kernel = functools.partial(
        _lb_block_kernel, h=h, w=w,
        s_expand=s_expand, s_dw=s_dw, s_project=s_project,
    )
    full = lambda *_: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rb, x_rows.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(we.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(be.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(dw16.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, wp.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            ((b + pad_b) * hw, wp.shape[1]), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(x_rows, we, be, dw16, wp)
    return out[: b * hw]


def etiny_pallas_params(sim_params: Dict, cfg: EtinySimCfg) -> Dict:
    """Re-layout `etiny_sim_params` arrays for the fused block kernels.

    Pointwise weights cast to bf16 (int8 values are always bf16-exact);
    dw taps flatten to a (16, Cmid) f32 row table (9 used rows, padded to
    a sublane tile). Raises ValueError for models the kernel path cannot
    serve bit-exactly (callers fall back to the XLA sim):
    non-power-of-two spatial dims are checked at trace time by
    `etiny_forward_pallas`; stride-2 dense blocks (the engine's
    dim-scrambling quirk, never emitted by our serializer —
    models/etinynet.py) are rejected here.
    """
    blocks = []
    for blk, bs in zip(sim_params["blocks"], cfg.blocks):
        if bs.is_dense and bs.stride != 1:
            raise ValueError(
                "stride-2 dense block (engine dim-preservation quirk) — "
                "use the XLA engine sim for this model"
            )
        dw_hwim = np.asarray(blk["dw_w"], np.float32)  # (3, 3, 1, mid)
        cmid = dw_hwim.shape[3]
        dw16 = np.zeros((16, cmid), np.float32)
        dw16[:9] = dw_hwim.reshape(9, cmid)
        blocks.append({
            "we": jnp.asarray(blk["pw_expand_w"], jnp.bfloat16),
            "be": jnp.asarray(blk["pw_expand_b"], jnp.float32).reshape(1, -1),
            "dw16": jnp.asarray(dw16),
            "wp": jnp.asarray(blk["pw_project_w"], jnp.bfloat16),
        })
    return {
        "stem_w": sim_params["stem_w"],
        "stem_b": sim_params["stem_b"],
        "blocks": blocks,
        "cls_w": sim_params["cls_w"],
        "cls_b": sim_params["cls_b"],
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "image_h", "image_w", "interpret", "conv_mode",
                     "rows_target"),
)
def etiny_forward_pallas(
    params: Dict,
    images: jnp.ndarray,
    *,
    cfg: EtinySimCfg,
    image_h: int,
    image_w: int,
    interpret: bool = False,
    conv_mode: str = "f32",
    rows_target: int = _ROWS_TARGET,
) -> jnp.ndarray:
    """Bit-exact EtinyNet int8 inference, fused-block Pallas path.

    Same contract as `etiny_engine_forward` (identical to the
    `etinynet_inference` CLI, nnue_engine.cpp:1318-1419), including the
    same safe `conv_mode="f32"` stem default — "bf16" is opt-in and
    exact only while every |quantized stem input| ≤ 256 (callers check
    `conv_inputs_bf16_safe`, as with the sim). Stem conv + pool +
    classifier run in XLA, every LB/DLB block as one Pallas kernel.
    Requires power-of-two spatial dims at every block (true for 32×32
    inputs; 112×112 ImageNet models fall back to the XLA sim).
    """
    s = cfg

    # Stem conv (cpp:1341-1351) — one fused XLA launch, same bf16 fast
    # path and exactness window as the sim.
    qin = jnp.trunc(images.astype(jnp.float32) * jnp.float32(s.stem_scale))
    dt = jnp.bfloat16 if conv_mode == "bf16" else jnp.float32
    acc = jax.lax.conv_general_dilated(
        qin.astype(dt), params["stem_w"].astype(dt), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + params["stem_b"]
    x = jnp.clip(jnp.trunc(acc * (1.0 / s.stem_scale)), -127, 127)

    for blk, bs in zip(params["blocks"], s.blocks):
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        if not (_is_pow2(h) and _is_pow2(w)):
            raise ValueError(
                f"block spatial dims {h}x{w} are not powers of two — "
                "use the XLA engine sim for this model"
            )
        rows = x.reshape(b * h * w, x.shape[3])
        out = lb_block_pallas(
            rows, blk["we"], blk["be"], blk["dw16"], blk["wp"],
            h=h, w=w, s_expand=bs.s_expand, s_dw=bs.s_dw,
            s_project=bs.s_project, interpret=interpret,
            rows_target=rows_target,
        )
        x = out.reshape(b, h, w, out.shape[1])
        if bs.stride != 1:
            # the stride-1 kernel computed every position; the engine's
            # stride-2 conv keeps the even ones (cpp:933-940)
            x = x[:, ::2, ::2, :]
        # dense blocks with stride 1 preserve dims — the quirk reshape
        # (engine_sim) is the identity; stride-2 dense was rejected at
        # parameter build.

    # Global average pool + classifier (cpp:1452-1463, 1028-1040),
    # identical to the sim tail.
    hw = x.shape[1] * x.shape[2]
    pooled_sum = x.sum(axis=(1, 2)).astype(jnp.int32)
    pooled = jnp.clip(_tdiv(pooled_sum, hw), -127, 127)
    out = _dot_i8(pooled.astype(jnp.int8), params["cls_w"]) + params["cls_b"]
    return out.astype(jnp.float32) / jnp.float32(s.cls_scale)
