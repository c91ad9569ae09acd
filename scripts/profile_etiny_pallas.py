#!/usr/bin/env python3
"""Time the fused-block EtinyNet Pallas path against the XLA engine sim
on the TPU (micro variant, 32×32 — the reference's test/bench model).

Timing contract matches bench.py: scan-chained reps whose input index
data-depends on the previous logits (no hoisting), one device→host
readback per measurement, best of 3. Asserts bit-equality between the
two paths before timing. Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.models.etinynet import (
    EtinyNetConfig,
    etinynet_init,
    etinynet_quantize,
)
from nnue_vision_tpu.ops.engine_sim import etiny_engine_forward, etiny_sim_params
from nnue_vision_tpu.ops.etiny_pallas import etiny_forward_pallas, etiny_pallas_params


def main(batch=2048, reps=100, n_buf=4, variant="micro"):
    np.asarray(jnp.zeros(()))  # warm the readback path

    e_cfg = EtinyNetConfig(variant=variant, num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(2), e_cfg)
    q = etinynet_quantize(params, stats, e_cfg)
    sim_params, cfg = etiny_sim_params(q)
    pp = etiny_pallas_params(sim_params, cfg)

    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.standard_normal((n_buf, batch, 32, 32, 3)).astype(np.float32)
    )

    # Both paths in the SAME stem mode — an apples-to-apples XLA-vs-Pallas
    # check. bf16 here is a timing configuration: these standard-normal
    # inputs exceed the |qx| <= 256 bf16-exact window, so neither path
    # would match the C++ engine (production callers gate bf16 on
    # conv_inputs_bf16_safe; both paths default to the safe f32 stem).
    ref = np.asarray(etiny_engine_forward(
        sim_params, data[0], cfg=cfg, image_h=32, image_w=32, conv_mode="bf16"
    ))
    got = np.asarray(etiny_forward_pallas(
        pp, data[0], cfg=cfg, image_h=32, image_w=32, conv_mode="bf16"
    ))
    assert np.array_equal(got, ref), "pallas path diverged from the sim"

    def timed(fwd):
        @jax.jit
        def run(d):
            def body(idx, _):
                x = jax.lax.dynamic_index_in_dim(d, idx, keepdims=False)
                logits = fwd(x)
                nxt = (
                    idx + 1 + logits.reshape(-1)[0].astype(jnp.int32) * 0
                ) % n_buf
                return nxt, logits[:1, :1]

            _, outs = jax.lax.scan(body, jnp.int32(0), None, length=reps)
            return outs[-1]

        np.asarray(run(data))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(data))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1000.0 / reps
        return batch / (ms / 1000.0), ms

    xla_ips, xla_ms = timed(
        lambda x: etiny_engine_forward(
            sim_params, x, cfg=cfg, image_h=32, image_w=32, conv_mode="bf16"
        )
    )
    results = {}
    # 65536 rows exceeds VMEM (measured: 128.21M of the 128M space)
    for rt in (4096, 16384, 32768):
        pl_ips, pl_ms = timed(
            lambda x: etiny_forward_pallas(
                pp, x, cfg=cfg, image_h=32, image_w=32, conv_mode="bf16",
                rows_target=rt,
            )
        )
        results[f"pallas_rt{rt}_images_per_sec"] = round(pl_ips, 1)
        results[f"pallas_rt{rt}_ms_per_batch"] = round(pl_ms, 4)
        print(f"# rt{rt}: {pl_ips:.0f} img/s ({pl_ms:.4f} ms)", flush=True)
    print(json.dumps({
        "variant": variant,
        "batch": batch,
        "xla_images_per_sec": round(xla_ips, 1),
        "xla_ms_per_batch": round(xla_ms, 4),
        **results,
        "bit_exact": True,
    }))


if __name__ == "__main__":
    main(
        batch=int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
        variant=sys.argv[2] if len(sys.argv) > 2 else "micro",
    )
