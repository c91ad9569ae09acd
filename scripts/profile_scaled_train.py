#!/usr/bin/env python3
"""Scaled-config train throughput (VERDICT r3 item 8): evidence the
framework's perf story is not an artifact of ~1M-param models.

Everything in BENCH_r0* trains the flagship ~1M-param NNUE, whose matmuls
leave the MXU ≥85% idle at the measured throughput — dispatch overhead,
not compute, is the binding resource there. This script trains a scaled
NNUE — grid 20×20×8 (3,200 sparse features, vs 800), L1=4096 (vs 1024),
input 77×77 (stride rule ceil((77-1)/(20-1)) = 4 gives an exact 20×20
conv output) — where the FT matmul alone is (B,3200)@(3200,4096) ≈ 26M
MAC/img and the train step is compute-dominated, then reports images/s
and MFU on the real chip.

The training step is the production one (fused Pallas input pipeline +
fwd + bwd + SGD + weight clip, lax.scan per dispatch), identical code to
training/loop.py's flagship path — only the model/config is scaled.

Usage:  python scripts/profile_scaled_train.py [--batch 2048] [--spd 8]
Prints one MEASURED: JSON line; paste the row into BASELINE_MEASURED.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nnue_vision_tpu.axon_preflight import wait_for_tunnel  # noqa: E402


def fwd_flops_per_image(cfg) -> float:
    """Analytic matmul/conv FLOPs (2·MACs) for one forward pass."""
    oh = ow = cfg.conv_out_hw
    ch = cfg.feature_set.num_features_per_square
    f = cfg.feature_set.num_features
    return 2.0 * (
        oh * ow * ch * 27
        + f * cfg.l1_size
        + cfg.l1_size * cfg.l2_size
        + cfg.l2_size * cfg.l3_size
        + cfg.l3_size * cfg.num_classes
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--spd", type=int, default=8, help="steps per dispatch")
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--n-data", type=int, default=8192)
    args = ap.parse_args()

    err = wait_for_tunnel()
    if err is not None:
        print(f"TPU tunnel unavailable: {err}", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import peak_flops
    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet,
        NNUEConfig,
        nnue_init,
    )
    from nnue_vision_tpu.ops.input_pipeline import prepare_gather_dataset
    from nnue_vision_tpu.training.optim import create_optimizer
    from nnue_vision_tpu.training.step import (
        make_train_state,
        scanned_train_steps_fused,
    )

    np.asarray(jnp.zeros(()))  # warm the d2h path

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(grid_size=20, num_features_per_square=8),
        l1_size=4096, l2_size=128, l3_size=32,
        num_classes=10, input_size=77,
    )
    assert cfg.conv_out_hw == 20, cfg.conv_out_hw

    class OptCfg:
        learning_rate = 0.01
        weight_decay = 2e-4
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = False
        max_epochs = 10
        decay_lr = False
        use_cyclical_lr = False

    optimizer = create_optimizer(OptCfg(), steps_per_epoch=args.spd)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    state = make_train_state(params, optimizer)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((args.n_data, 77, 77, 3), dtype=np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 10, args.n_data).astype(np.int64))
    gather_ds = prepare_gather_dataset(images)
    key = jax.random.PRNGKey(1)

    def dispatch(st, k, idx_chunk):
        k, sub = jax.random.split(k)
        st, m = scanned_train_steps_fused(
            st, gather_ds, labels, idx_chunk, sub,
            model_type="nnue", model_cfg=cfg, optimizer=optimizer,
            height=77, width=77,
        )
        return st, k, m

    idx0 = jnp.asarray(rng.integers(0, args.n_data, (args.spd, args.batch)))
    t0 = time.perf_counter()
    state, key, metrics = dispatch(state, key, idx0)
    np.asarray(metrics["loss"])
    compile_s = time.perf_counter() - t0
    state, key, metrics = dispatch(state, key, idx0)
    np.asarray(metrics["loss"])

    chunks = [
        jnp.asarray(rng.integers(0, args.n_data, (args.spd, args.batch)))
        for _ in range(args.dispatches)
    ]
    t0 = time.perf_counter()
    for c in chunks:
        state, key, metrics = dispatch(state, key, c)
    loss = float(np.asarray(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    images_done = args.dispatches * args.spd * args.batch
    ips = images_done / dt
    fwd = fwd_flops_per_image(cfg)
    peak = peak_flops(jax.devices()[0])
    mfu = ips * 3.0 * fwd / peak
    assert mfu < 1.0, f"impossible MFU {mfu}"

    print("MEASURED: " + json.dumps({
        "config": "grid20x20x8_L1-4096_input77",
        "params": n_params,
        "batch": args.batch,
        "steps_per_dispatch": args.spd,
        "train_images_per_sec": round(ips, 1),
        "train_mfu": round(mfu, 4),
        "fwd_flops_per_image": fwd,
        "compile_s": round(compile_s, 1),
        "final_loss": round(loss, 4),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
