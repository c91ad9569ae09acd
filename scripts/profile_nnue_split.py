#!/usr/bin/env python3
"""Split-profile the int8 NNUE inference pipeline on the TPU.

Times, with the readback-forced dependency-chained method (bench.py's
timing contract), each stage of the fused path at serving batch size:

  conv_f32   — the XLA conv frontend as shipped (f32 integer-valued)
  conv_bf16  — same conv with bf16 MXU feeds (exact while |qx| ≤ 256,
               the bf16 exact-integer window — engine_sim._BF16_EXACT_INT;
               production-normalized images give |qx| ≤ ~192 at scale 64)
  head       — the Pallas fused head alone (raw accumulator precomputed)
  xla_full   — ops/engine_sim.nnue_engine_forward (the XLA baseline)
  pallas_full— ops/pallas_kernels.nnue_engine_forward_fused

Prints one JSON line with ms/batch and images/s for each stage, plus the
bit-exactness check of conv_bf16 against conv_f32 on the probe batch.
Replaces the round-1 conv-fusion split measured with the broken
block_until_ready clock (VERDICT r1 weak #3).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nnue_vision_tpu.data.augment import normalize_images  # noqa: E402
from nnue_vision_tpu.models.nnue import (  # noqa: E402
    GridFeatureSet,
    NNUEConfig,
    nnue_init,
    nnue_quantize,
)
from nnue_vision_tpu.ops.engine_sim import (  # noqa: E402
    _int_conv3x3,
    _quantize_input,
    engine_conv_stride,
    nnue_engine_forward,
    nnue_sim_params,
)
from nnue_vision_tpu.ops.pallas_kernels import (  # noqa: E402
    _fused_head_call,
    mega_head_params,
    nnue_engine_forward_fused,
    nnue_engine_forward_mega,
    pallas_head_params,
)


def chained_ms(fwd, data, reps=None):
    """ms per call: `reps` scan-chained calls in one dispatch, one forced
    d2h readback, best of 3 (bench.py timing contract)."""
    if reps is None:
        reps = 400 if jax.devices()[0].platform != "cpu" else 2
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

    np.asarray(run(data))  # compile + warm readback
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(data))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1000.0


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    # CPU has no Mosaic backend; fall back to interpret mode so the script
    # smoke-tests anywhere (timings are only meaningful on the TPU).
    interp = jax.devices()[0].platform == "cpu"

    mcfg = NNUEConfig(
        feature_set=GridFeatureSet(10, 8),
        l1_size=1024, l2_size=128, l3_size=32,
        num_classes=10, input_size=32,
    )
    params = nnue_init(jax.random.PRNGKey(0), mcfg)
    q = nnue_quantize(params, mcfg)
    sim_params, cfg = nnue_sim_params(q)
    head = pallas_head_params(sim_params)

    n_buf = 4
    raw = rng.random((n_buf, batch, 32, 32, 3), dtype=np.float32)
    data = jnp.asarray(normalize_images(raw.reshape(-1, 32, 32, 3)).reshape(
        n_buf, batch, 32, 32, 3))

    stride = engine_conv_stride(32, cfg.grid_size)

    def conv_f32(x):
        qin = _quantize_input(x, cfg.conv_scale)
        return _int_conv3x3(
            qin, sim_params["conv_w"], sim_params["conv_b"], stride
        ).astype(jnp.float32)

    def conv_bf16(x):
        qin = _quantize_input(x, cfg.conv_scale)
        lhs = qin.astype(jnp.bfloat16)
        rhs = jnp.transpose(sim_params["conv_w"], (2, 3, 1, 0)).astype(
            jnp.bfloat16)
        acc = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return acc + sim_params["conv_b"].astype(jnp.float32)

    # bit-exactness probe for the bf16 conv on production-normalized data
    a32 = np.asarray(conv_f32(data[0]))
    a16 = np.asarray(conv_bf16(data[0]))
    bf16_exact = bool(np.array_equal(a32, a16))

    acc0 = conv_f32(data[0])
    b_, oh, ow, c_ = acc0.shape
    fr = oh * ow * c_
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    accs = jnp.stack(
        [conv_f32(data[i]).reshape(batch, fr) for i in range(n_buf)]
    )

    def head_only(a):
        logits, _ = _fused_head_call(
            head, a, cfg=cfg, fr=fr, n_pad=num_features - fr,
            conv_scale=cfg.conv_scale, tile_b=1024, interpret=interp,
        )
        return logits

    stages = {
        "conv_f32": lambda: chained_ms(conv_f32, data),
        "conv_bf16": lambda: chained_ms(conv_bf16, data),
        "head_pallas": lambda: chained_ms(head_only, accs),
        "xla_full": lambda: chained_ms(
            lambda x: nnue_engine_forward(
                sim_params, x, cfg=cfg, image_h=32, image_w=32)[0], data),
        "xla_full_bf16conv": lambda: chained_ms(
            lambda x: nnue_engine_forward(
                sim_params, x, cfg=cfg, image_h=32, image_w=32,
                conv_mode="bf16")[0], data),
        "pallas_full": lambda: chained_ms(
            lambda x: nnue_engine_forward_fused(
                sim_params, head, x, cfg=cfg, image_h=32, image_w=32,
                interpret=interp)[0],
            data),
        "pallas_full_bf16conv": lambda: chained_ms(
            lambda x: nnue_engine_forward_fused(
                sim_params, head, x, cfg=cfg, image_h=32, image_w=32,
                interpret=interp, conv_mode="bf16")[0],
            data),
        "pallas_serve_bf16conv": lambda: chained_ms(
            lambda x: nnue_engine_forward_fused(
                sim_params, head, x, cfg=cfg, image_h=32, image_w=32,
                interpret=interp, conv_mode="bf16", with_count=False)[0],
            data),
    }
    # Megafused single-kernel path: input arrives flat (B, H·W·3) — the
    # engine .bin serving layout — so no device-side relayout anywhere.
    mega = mega_head_params(sim_params, cfg, 32, 32)
    data_flat = data.reshape(n_buf, batch, 32 * 32 * 3)
    mega_probe = np.asarray(nnue_engine_forward_mega(
        mega, data_flat[0], cfg=cfg, image_h=32, image_w=32,
        interpret=interp)[0])
    ref_probe = np.asarray(nnue_engine_forward(
        sim_params, data[0], cfg=cfg, image_h=32, image_w=32)[0])
    mega_exact = bool(np.array_equal(mega_probe, ref_probe))

    stages["mega_full"] = lambda: chained_ms(
        lambda x: nnue_engine_forward_mega(
            mega, x, cfg=cfg, image_h=32, image_w=32, interpret=interp)[0],
        data_flat)
    stages["mega_serve"] = lambda: chained_ms(
        lambda x: nnue_engine_forward_mega(
            mega, x, cfg=cfg, image_h=32, image_w=32, interpret=interp,
            with_count=False)[0],
        data_flat)
    for tb in (256, 512, 1024):
        if tb > batch:
            continue
        stages[f"mega_serve_tile{tb}"] = lambda tb=tb: chained_ms(
            lambda x: nnue_engine_forward_mega(
                mega, x, cfg=cfg, image_h=32, image_w=32, tile_b=tb,
                interpret=interp, with_count=False)[0],
            data_flat)

    out = {"batch": batch, "bf16_conv_exact": bf16_exact,
           "mega_exact": mega_exact}
    for name, f in stages.items():
        try:
            ms = f()
        except Exception as e:  # keep profiling the remaining stages
            out[name + "_error"] = str(e).split("\n")[0][:160]
            continue
        out[name + "_ms"] = round(ms, 4)
        out[name + "_images_per_sec"] = round(batch / (ms / 1000.0))

    # Pallas batch-tile sweep (VMEM residency vs grid-dispatch tradeoff).
    for tb in (256, 512, 1024, 2048):
        if tb > batch:
            continue
        try:
            ms = chained_ms(
                lambda x, tb=tb: nnue_engine_forward_fused(
                    sim_params, head, x, cfg=cfg, image_h=32, image_w=32,
                    tile_b=tb, interpret=interp, conv_mode="bf16")[0],
                data,
            )
        except Exception as e:
            out[f"pallas_tile{tb}_error"] = str(e).split("\n")[0][:160]
            continue
        out[f"pallas_tile{tb}_ms"] = round(ms, 4)
    print(json.dumps(out))
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
