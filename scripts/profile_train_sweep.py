#!/usr/bin/env python3
"""Training-throughput batch sweep on the TPU (readback-forced timing).

The headline bench pins batch 512 (the upstream production config); this
sweep measures the full scanned training step at growing batch sizes to
show where the chip saturates — augmentation + optimizer elementwise work
amortizes, MXU tiles fill, and images/s climbs until HBM bandwidth or
dispatch overhead flattens it. One JSON line per batch size.

``--fused`` sweeps the fused Pallas input path (the round-4 production
step) instead of the jnp pipeline — the round-3 sweep that informed the
batch-512 default was measured UNFUSED (VERDICT r4 item 4), so the
production-default question must be re-answered on the fused kernel.
``--spd`` sweeps steps-per-dispatch at each batch size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nnue_vision_tpu.models.nnue import (  # noqa: E402
    GridFeatureSet,
    NNUEConfig,
    nnue_init,
)
from nnue_vision_tpu.training.optim import create_optimizer  # noqa: E402
from nnue_vision_tpu.training.step import (  # noqa: E402
    make_train_state,
    scanned_train_steps,
    scanned_train_steps_fused,
)


class OptCfg:
    learning_rate = 0.01
    weight_decay = 2e-4
    momentum = 0.9
    optimizer_type = "sgd"
    max_grad_norm = 1.0
    use_cosine_scheduler = True
    max_epochs = 300
    decay_lr = True
    use_cyclical_lr = False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("batches", nargs="*", type=int,
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--fused", action="store_true",
                    help="sweep the fused Pallas input path")
    ap.add_argument("--spd", type=int, nargs="*", default=[64],
                    help="steps-per-dispatch values to sweep")
    ap.add_argument("--strength", default="light",
                    help="augmentation tier for the unfused path "
                         "(the fused kernel implements the light tier)")
    args = ap.parse_args()
    batches = args.batches or [512, 1024, 2048, 4096]
    np.asarray(jnp.zeros(()))  # d2h warm

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(10, 8),
        l1_size=1024, l2_size=128, l3_size=32,
        num_classes=10, input_size=32,
    )
    rng = np.random.default_rng(0)
    n_data = 8192
    device_images = jnp.asarray(
        rng.random((n_data, 32, 32, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 10, n_data).astype(np.int64))
    gather_ds = None
    if args.fused:
        from nnue_vision_tpu.ops.input_pipeline import prepare_gather_dataset

        gather_ds = prepare_gather_dataset(device_images)

    for spd in args.spd:
        for batch in batches:
            optimizer = create_optimizer(OptCfg(), steps_per_epoch=97)
            state = make_train_state(
                nnue_init(jax.random.PRNGKey(0), cfg), optimizer)
            key = jax.random.PRNGKey(1)

            def one_dispatch(state, key, idx_chunk):
                key, sub = jax.random.split(key)
                if args.fused:
                    state, metrics = scanned_train_steps_fused(
                        state, gather_ds, device_labels, idx_chunk, sub,
                        model_type="nnue", model_cfg=cfg,
                        optimizer=optimizer, height=32, width=32,
                    )
                else:
                    state, metrics = scanned_train_steps(
                        state, device_images, device_labels, idx_chunk, sub,
                        model_type="nnue", model_cfg=cfg,
                        optimizer=optimizer, strength=args.strength,
                        augment=True,
                    )
                return state, key, metrics

            idx0 = jnp.asarray(rng.integers(0, n_data, (spd, batch)))
            for _ in range(2):
                state, key, metrics = one_dispatch(state, key, idx0)
            np.asarray(metrics["loss"])  # compile + warm readback

            dispatches = max(4, (1 << 22) // (spd * batch))  # ~4M images
            chunks = [jnp.asarray(rng.integers(0, n_data, (spd, batch)))
                      for _ in range(dispatches)]
            t0 = time.perf_counter()
            for idx_chunk in chunks:
                state, key, metrics = one_dispatch(state, key, idx_chunk)
            loss = float(np.asarray(metrics["loss"])[-1])  # forces the chain
            dt = time.perf_counter() - t0
            ips = dispatches * spd * batch / dt
            print(json.dumps({
                "fused": bool(args.fused), "batch": batch,
                "steps_per_dispatch": spd, "strength": args.strength,
                "images_per_sec": round(ips), "final_loss": round(loss, 4),
            }))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
