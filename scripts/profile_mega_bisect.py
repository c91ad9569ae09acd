#!/usr/bin/env python3
"""Bisect the megafused kernel's time by truncating it after each stage.

Variants (serve mode, tile 512 unless noted):
  v0_dma       — load the input tile, write a slice (pure HBM read cost)
  v1_quant     — + trunc(x·64) and bf16 cast
  v2_conv      — + the (H·W·3, FR) conv matmul
  v3_ft        — + epilogue, threshold, FT matmul
  v4_full      — the shipped kernel (logits out)

Each prints ms/batch with the readback-forced chained timing. The deltas
localize the cost: DMA exposure, VPU quantize, MXU conv, VPU head ops.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from nnue_vision_tpu.data.augment import normalize_images  # noqa: E402
from nnue_vision_tpu.models.nnue import (  # noqa: E402
    GridFeatureSet, NNUEConfig, nnue_init, nnue_quantize,
)
from nnue_vision_tpu.ops.engine_sim import nnue_sim_params  # noqa: E402
from nnue_vision_tpu.ops.timing import scalar_chained_best_ms  # noqa: E402
from nnue_vision_tpu.ops.pallas_kernels import (  # noqa: E402
    _wrap_i16_i32, mega_head_params, nnue_engine_forward_mega,
)


def chained_ms(fwd, data, reps=400):
    """Buffer-gather chaining (bench.py's original method; kept in sync
    by hand with bench.py's timed_infer — their traced graphs differ
    slightly and unifying them would invalidate the driver's warm
    compile cache). For Pallas consumers the dynamic slice cannot fuse
    into the kernel operand, so this method pays a full HBM copy of the
    input per rep — use scalar_chained_ms for Pallas paths."""
    n_buf = data.shape[0]

    @jax.jit
    def run(d):
        def body(idx, _):
            x = jax.lax.dynamic_index_in_dim(d, idx, keepdims=False)
            out = fwd(x)
            lead = out.reshape(-1)[0].astype(jnp.float32)
            nxt = (idx + 1 + lead.astype(jnp.int32) * 0) % n_buf
            return nxt, lead

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=reps)
        return outs[-1]

    np.asarray(run(data))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(data))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1000.0


def scalar_chained_ms(fwd_with_bump, data_one, reps=400):
    """Serialize reps through a SCALAR data dependency instead of a
    buffer gather (shared harness — nnue_vision_tpu/ops/timing.py; the
    bump depends on the previous rep's output, so reps cannot overlap or
    CSE, while each rep still re-reads the full input from HBM). This
    measures the kernel itself, without the harness-side 100MB copy the
    buffer-gather method pays on Pallas consumers."""
    return scalar_chained_best_ms(fwd_with_bump, data_one, reps)


def make_stage_call(head, cfg, level, tile_b=512):
    """Pallas call truncated after `level` stages (0..3)."""
    l1 = cfg.l1
    fr = head["conv_wfull"].shape[1]
    hw3 = head["conv_wfull"].shape[0]
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    n_pad = num_features - fr
    ft_w = head["ft_w"][:fr]
    padsum = jnp.sum(head["ft_w"][fr:].astype(jnp.float32), axis=0,
                     keepdims=True) if n_pad else jnp.zeros((1, l1),
                                                            jnp.float32)

    def kernel(bump_ref, img_ref, wfull_ref, cbias_ref, thresh_ref,
               padsum_ref, ft_w_ref, ft_b_ref, out_ref):
        # bump is 0.0 at runtime; adding it to the output creates the
        # inter-rep data dependency the scalar-chained timing needs.
        bump = bump_ref[0, 0]
        x = img_ref[:]
        if level == 0:
            out_ref[:] = x[:, :128] + bump
            return
        qx = jnp.trunc(x * np.float32(cfg.conv_scale)).astype(jnp.bfloat16)
        if level == 1:
            out_ref[:] = qx[:, :128].astype(jnp.float32) + bump
            return
        acc = jnp.dot(qx, wfull_ref[:], preferred_element_type=jnp.float32)
        acc = acc + cbias_ref[:]
        if level == 2:
            out_ref[:] = acc[:, :128] + bump
            return
        xx = jnp.clip(jnp.trunc(acc * (1.0 / cfg.conv_scale)), -127.0, 127.0)
        thr = thresh_ref[0, 0]
        mask = xx > thr
        pad_active = (0.0 > thr).astype(jnp.float32)
        ft = jnp.dot(mask.astype(ft_w_ref.dtype), ft_w_ref[:],
                     preferred_element_type=jnp.float32)
        ft = ft + ft_b_ref[:] + pad_active * padsum_ref[:]
        ft = _wrap_i16_i32(ft.astype(jnp.int32))
        ft = jnp.clip(ft, 0, cfg.quantized_one).astype(jnp.float32)
        out_ref[:] = ft[:, :128] + bump

    full = lambda *_: (0, 0)  # noqa: E731

    @jax.jit
    def call(images_flat, bump):
        b = images_flat.shape[0]
        n_tiles = b // tile_b
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_b, hw3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hw3, fr), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fr), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, l1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((fr, l1), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l1), full, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(bump.reshape(1, 1), images_flat, head["conv_wfull"],
          head["conv_bias_row"], head["thresh"], padsum, ft_w, head["ft_b"])

    return call


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)

    mcfg = NNUEConfig(
        feature_set=GridFeatureSet(10, 8),
        l1_size=1024, l2_size=128, l3_size=32,
        num_classes=10, input_size=32,
    )
    params = nnue_init(jax.random.PRNGKey(0), mcfg)
    q = nnue_quantize(params, mcfg)
    sim_params, cfg = nnue_sim_params(q)
    head = mega_head_params(sim_params, cfg, 32, 32)

    n_buf = 4
    raw = rng.random((n_buf, batch, 32, 32, 3), dtype=np.float32)
    data = jnp.asarray(
        normalize_images(raw.reshape(-1, 32, 32, 3)).reshape(
            n_buf, batch, 32 * 32 * 3)
    )

    out = {"batch": batch}
    data_one = data[0]
    for level, name in enumerate(["v0_dma", "v1_quant", "v2_conv", "v3_ft"]):
        call = make_stage_call(head, cfg, level)
        ms = scalar_chained_ms(call, data_one)
        out[name + "_ms"] = round(ms, 4)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    def mega_bump(x, bump):
        h2 = dict(head)
        h2["thresh"] = head["thresh"] + bump
        return nnue_engine_forward_mega(
            h2, x, cfg=cfg, image_h=32, image_w=32, with_count=False)[0]

    out["v4_full_ms"] = round(scalar_chained_ms(mega_bump, data_one), 4)
    # the old buffer-gather timing, for the harness-copy delta record
    out["v4_full_buffergather_ms"] = round(chained_ms(
        lambda x: nnue_engine_forward_mega(
            head, x, cfg=cfg, image_h=32, image_w=32, with_count=False)[0],
        data,
    ), 4)
    for k in ("v0_dma", "v1_quant", "v2_conv", "v3_ft", "v4_full"):
        out[k + "_images_per_sec"] = round(batch / (out[k + "_ms"] / 1e3))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
