#!/usr/bin/env python3
"""Evaluation entry points (module surface parity with upstream evaluate.py).

Re-exports the evaluation API and adds a CLI:
  python evaluate.py <checkpoint.ckpt> [--dataset cifar10] [--compiled]
"""

import argparse
import os
import sys
from pathlib import Path

# NV_PLATFORM=cpu forces the CPU backend in-process (same guard as
# train.py: this machine pins JAX_PLATFORMS=axon at a level a plain env
# var does not override, and the TPU is single-tenant — a CPU-intended
# eval would otherwise block on a busy chip).
if os.environ.get("NV_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NV_PLATFORM"])

from nnue_vision_tpu.training.evaluate import (  # noqa: F401
    evaluate_compiled_model,
    evaluate_int8_sim,
    evaluate_model,
    evaluate_model_comprehensive,
)
from nnue_vision_tpu.training.metrics import compute_metrics  # noqa: F401


def main() -> int:
    parser = argparse.ArgumentParser(description="Evaluate a trained checkpoint")
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument("--compiled", action="store_true",
                        help="also run the C++ engine evaluation")
    parser.add_argument("--seed", type=int, default=42,
                        help="dataset seed (must match the training run's "
                        "to evaluate on the same held-out split)")
    parser.add_argument("--synthetic_size", type=int, default=512,
                        help="synthetic train-split size; the test split is "
                        "size//4 (must match the training run's)")
    args = parser.parse_args()

    from serialize import load_checkpoint_auto

    from nnue_vision_tpu.data.loaders import create_data_loaders

    model_type, params, batch_stats, cfg = load_checkpoint_auto(args.checkpoint)
    _, _, test_loader = create_data_loaders(
        dataset_name=args.dataset,
        batch_size=args.batch_size,
        max_samples_per_split=args.max_samples,
        use_augmentation=False,
        seed=args.seed,
        synthetic_size=args.synthetic_size,
    )

    loss, metrics = evaluate_model(
        params, batch_stats, test_loader, model_type=model_type, model_cfg=cfg
    )
    print(f"float: loss={loss:.4f} " +
          " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    sim = evaluate_int8_sim(
        params, batch_stats, test_loader, model_type=model_type, model_cfg=cfg
    )
    print("int8-sim: " + " ".join(f"{k}={v:.4f}" for k, v in sim.items()))

    if args.compiled:
        compiled = evaluate_compiled_model(
            params, batch_stats, test_loader, model_type=model_type, model_cfg=cfg
        )
        print("engine: " + " ".join(f"{k}={v:.4f}" for k, v in compiled.items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
