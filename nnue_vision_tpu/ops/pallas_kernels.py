"""Pallas TPU kernels for the NNUE hot path.

`fused_nnue_head`: one kernel for the entire NNUE post-conv pipeline —
threshold compare → feature-transformer matmul (MXU) → int16 wraparound →
clipped ReLU → pairwise interaction → three dense layers → float logits +
active-feature count. The XLA version materializes the (B, F) mask and the
(B, L1) accumulator in HBM between ops; here every intermediate lives in
VMEM for the whole batch tile, so HBM traffic is one read of the conv
buffer + the weights and one write of the logits.

Bit-exactness contract is identical to ops/engine_sim.py (same integer
semantics, computed in integer-valued f32 where exact, int32 where
wraparound matters). Weights fit VMEM comfortably for the production model
(FT 800×1024 f32 = 3.3 MB; everything else < 1 MB).
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
    _tdiv,
    engine_conv_stride,
)


def _wrap_i16_i32(x: jnp.ndarray) -> jnp.ndarray:
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def _head_kernel(
    conv_ref,      # (TILE_B, F) f32 — int-valued conv output (padded grid)
    thresh_ref,    # (1, 1) f32 SMEM
    ft_w_ref,      # (F, L1) f32
    ft_b_ref,      # (1, L1) f32
    fc1_w_ref,     # (L1, L2) f32
    fc1_b_ref,     # (1, L2) f32
    fc2_w_ref,     # (L2, L3) f32
    fc2_b_ref,     # (1, L3) f32
    out_w_ref,     # (L3, C) f32
    out_b_ref,     # (1, C) f32
    logits_ref,    # (TILE_B, C) f32
    count_ref,     # (TILE_B, 128) i32 (count broadcast in col 0)
    *,
    l1: int,
    qone: int,
    s1: int,
    s2: int,
    out_scale: float,
):
    mask = (conv_ref[:] > thresh_ref[0, 0]).astype(jnp.float32)
    count_ref[:] = jnp.broadcast_to(
        mask.sum(axis=1, keepdims=True).astype(jnp.int32), count_ref.shape
    )

    # FT accumulate on the MXU; exact (≤ F·127 + bias < 2^24), then int16
    # wraparound + clipped ReLU (engine semantics).
    ft = jnp.dot(mask, ft_w_ref[:], preferred_element_type=jnp.float32)
    ft = ft + ft_b_ref[:]
    ft = _wrap_i16_i32(ft.astype(jnp.int32))
    ft = jnp.clip(ft, 0, qone).astype(jnp.float32)

    # pairwise: trunc((a*b)/128) clamp [0,127]; concat with clamp(a).
    half = l1 // 2
    a = ft[:, :half]
    b = ft[:, half:]
    prod = jnp.clip(jnp.trunc(a * b * (1.0 / 128.0)), 0.0, 127.0)
    pairwise = jnp.concatenate([prod, jnp.clip(a, 0.0, 127.0)], axis=1)

    # fc1: trunc(acc / s1) clamp [0,127]  (s1 is a power of two → exact).
    h1 = jnp.dot(pairwise, fc1_w_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.clip(jnp.trunc((h1 + fc1_b_ref[:]) * (1.0 / s1)), 0.0, 127.0)

    # fc2: trunc(acc / s2) clamp ±127 then ReLU.
    h2 = jnp.dot(h1, fc2_w_ref[:], preferred_element_type=jnp.float32)
    h2 = jnp.clip(jnp.trunc((h2 + fc2_b_ref[:]) * (1.0 / s2)), -127.0, 127.0)
    h2 = jnp.maximum(h2, 0.0)

    # output layer: float logits acc / out_scale.
    out = jnp.dot(h2, out_w_ref[:], preferred_element_type=jnp.float32)
    logits_ref[:] = (out + out_b_ref[:]) * np.float32(1.0 / out_scale)


def pallas_head_params(sim_params: Dict) -> Dict:
    """Re-layout engine-sim params for the fused kernel (transposed dense
    weights, 2-D biases)."""
    return {
        "thresh": sim_params["visual_threshold"].reshape(1, 1),
        "ft_w": sim_params["ft_w"].astype(jnp.float32),
        "ft_b": sim_params["ft_b"].astype(jnp.float32).reshape(1, -1),
        "fc1_w": sim_params["fc1_w"].astype(jnp.float32).T,
        "fc1_b": sim_params["fc1_b"].astype(jnp.float32).reshape(1, -1),
        "fc2_w": sim_params["fc2_w"].astype(jnp.float32).T,
        "fc2_b": sim_params["fc2_b"].astype(jnp.float32).reshape(1, -1),
        "out_w": sim_params["out_w"].astype(jnp.float32).T,
        "out_b": sim_params["out_b"].astype(jnp.float32).reshape(1, -1),
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile_b", "interpret")
)
def fused_nnue_head(
    head_params: Dict,
    conv_buf: jnp.ndarray,  # (B, F) f32, int-valued (padded grid buffer)
    *,
    cfg: NNUESimCfg,
    tile_b: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logits (B, C) f32, active_count (B,) i32) — bit-exact engine head."""
    b, f = conv_buf.shape
    l1 = cfg.l1

    # pad batch to a tile multiple
    tile_b = min(tile_b, max(8, b))
    pad_b = (-b) % tile_b
    if pad_b:
        conv_buf = jnp.pad(conv_buf, ((0, pad_b), (0, 0)))
    bp = conv_buf.shape[0]

    kernel = functools.partial(
        _head_kernel,
        l1=l1,
        qone=cfg.quantized_one,
        s1=cfg.fc1_scale,
        s2=cfg.fc2_scale,
        out_scale=cfg.out_scale,
    )

    n_tiles = bp // tile_b
    full = lambda *_: (0, 0)  # noqa: E731 — whole-array blocks each step
    logits, count = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((f, l1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, cfg.l2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.l2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.l2, cfg.l3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.l3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.l3, cfg.num_classes), full,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.num_classes), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, cfg.num_classes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, cfg.num_classes), jnp.float32),
            jax.ShapeDtypeStruct((bp, 128), jnp.int32),
        ),
        interpret=interpret,
    )(
        conv_buf,
        head_params["thresh"],
        head_params["ft_w"],
        head_params["ft_b"],
        head_params["fc1_w"],
        head_params["fc1_b"],
        head_params["fc2_w"],
        head_params["fc2_b"],
        head_params["out_w"],
        head_params["out_b"],
    )
    return logits[:b], count[:b, 0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_h", "image_w", "interpret")
)
def nnue_engine_forward_fused(
    sim_params: Dict,
    head_params: Dict,
    images: jnp.ndarray,
    *,
    cfg: NNUESimCfg,
    image_h: int,
    image_w: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full bit-exact NNUE int8 inference with the Pallas fused head.

    Same contract as engine_sim.nnue_engine_forward: (logits, density,
    active_count). The conv frontend stays on the XLA conv unit; everything
    after it is one Pallas kernel.
    """
    stride = engine_conv_stride(image_h, cfg.grid_size)
    qin = _quantize_input(images, cfg.conv_scale)
    acc = _int_conv3x3(qin, sim_params["conv_w"], sim_params["conv_b"], stride)
    conv_out = jnp.clip(_tdiv(acc, cfg.conv_scale), -127, 127)

    b = conv_out.shape[0]
    flat = conv_out.reshape(b, -1).astype(jnp.float32)
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    buf = jnp.pad(flat, ((0, 0), (0, num_features - flat.shape[1])))

    logits, count = fused_nnue_head(
        head_params, buf, cfg=cfg, interpret=interpret
    )
    density = count.astype(jnp.float32) / sim_params["num_features_f32"]
    return logits, density, count
