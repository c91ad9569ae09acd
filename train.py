#!/usr/bin/env python3
"""Training CLI for NNUE and EtinyNet models.

Flag surface parity with the upstream trainer (train.py:474-566 upstream):
positional model_type ∈ {nnue, etinynet}, --config, --batch_size,
--max_epochs, --learning_rate, --note, --wandb_api_key, --wandb-run-id,
--log_dir, --use_augmentation, --augmentation_strength, --etinynet_variant,
--dataset_name, --num_classes. Upstream hard-requires WANDB_API_KEY
(train.py:577-580); here a missing key falls back to local run tracking so
air-gapped training works (set NV_REQUIRE_WANDB=1 to restore the hard
requirement).
"""

import argparse
import os
import sys

from config import ConfigError, load_config
from nnue_vision_tpu.training.logging import early_log


def setup_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train NNUE and EtinyNet models")
    parser.add_argument("model_type", choices=["nnue", "etinynet"],
                        help="Model type to train")
    parser.add_argument("--config", type=str, help="Path to the configuration file")
    parser.add_argument("--batch_size", type=int, help="Override batch size")
    parser.add_argument("--max_epochs", type=int, help="Override max epochs")
    parser.add_argument("--learning_rate", type=float, help="Override learning rate")
    parser.add_argument("--note", type=str, help="Note to add to the run")
    parser.add_argument("--wandb_api_key", type=str, help="W&B API key")
    parser.add_argument("--wandb-run-id", type=str, help="Resume a specific run id")
    parser.add_argument("--log_dir", type=str, default="logs",
                        help="Directory for logs and checkpoints")
    parser.add_argument("--use_augmentation", type=lambda x: x.lower() == "true",
                        help="Enable data augmentation (true/false)")
    parser.add_argument("--augmentation_strength",
                        choices=["light", "medium", "heavy"],
                        help="Augmentation strength")
    parser.add_argument("--etinynet_variant", type=str,
                        choices=["0.75", "1.0", "0.98M", "micro"],
                        help="EtinyNet variant")
    parser.add_argument("--dataset_name", type=str,
                        choices=["cifar10", "cifar100", "imagenet", "synthetic",
                                 "synthetic-hard"],
                        help="Dataset to use")
    parser.add_argument("--num_classes", type=int, help="Number of classes")
    parser.add_argument("--seed", type=int,
                        help="Override training/data seed (variance studies)")
    parser.add_argument("--synthetic_class_seed", type=int,
                        help="Synthetic-hard generator variant (atom "
                             "dictionary + class signatures)")
    parser.add_argument("--distill_from", type=str,
                        help="Checkpoint path of a frozen teacher for "
                             "knowledge distillation")
    parser.add_argument("--ef_warmup_epochs", type=int,
                        help="Override progressive-QAT warmup epochs")
    parser.add_argument("--name_suffix", type=str,
                        help="Suffix appended to the config name (run labeling)")
    parser.add_argument("--checkpoint_metric", choices=["val_f1", "compiled_f1"],
                        help="Best-model gate: upstream float val F1 "
                             "(default) or the deployed int8 compiled F1")
    parser.add_argument("--eval_train_samples", type=int,
                        help="Evaluate per-epoch train metrics on only the "
                             "first N samples (cheaper epochs)")
    parser.add_argument("--eval_batch_size", type=int,
                        help="Batch size for per-epoch evals (device-resident "
                             "slicing makes larger batches free)")
    # Multi-host (DCN) surface: every host runs the same command with its
    # own --process-id; omit all three on real TPU pods for auto-discovery
    # (parallel/distributed.py; SURVEY.md §2.15 DCN row).
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 for jax.distributed")
    parser.add_argument("--num-hosts", type=int, default=None,
                        help="Total number of participating host processes")
    parser.add_argument("--process-id", type=int, default=None,
                        help="This host's index in [0, num-hosts)")
    return parser


def load_and_setup_config(args: argparse.Namespace, model_type: str):
    if args.config is None:
        args.config = f"config/train_{model_type}_default.py"
    early_log(f"Loading configuration: {args.config}")
    config = load_config(args.config)
    early_log(f"Configuration loaded: {config.name}")

    for attr in ("batch_size", "max_epochs", "learning_rate", "note",
                 "use_augmentation", "augmentation_strength", "num_classes",
                 "dataset_name", "etinynet_variant", "seed",
                 "synthetic_class_seed", "distill_from", "ef_warmup_epochs",
                 "checkpoint_metric", "eval_train_samples", "eval_batch_size"):
        value = getattr(args, attr, None)
        if value is not None:
            setattr(config, attr, value)
    if args.log_dir:
        config.log_dir = args.log_dir
    if getattr(args, "name_suffix", None):
        config.name = f"{config.name}_{args.name_suffix}"
    return config


def main() -> int:
    parser = setup_argument_parser()
    args = parser.parse_args()

    if args.wandb_api_key:
        os.environ["WANDB_API_KEY"] = args.wandb_api_key
    if os.environ.get("NV_REQUIRE_WANDB") == "1" and not os.getenv("WANDB_API_KEY"):
        early_log("Error: WANDB_API_KEY required (NV_REQUIRE_WANDB=1)")
        return 1

    # NV_PLATFORM=cpu forces the CPU backend in-process. This machine
    # pins JAX_PLATFORMS=axon at a level a plain env var does not
    # reliably override (same fix as tests/conftest.py) — needed for CPU
    # smoke runs while the TPU is occupied by a training queue.
    if os.environ.get("NV_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["NV_PLATFORM"])
    else:
        # Training will run on the tunneled TPU: fail fast with a clear
        # message when the remote-compile relay is down instead of
        # hanging in jax device init.
        from nnue_vision_tpu.axon_preflight import tunnel_error

        err = tunnel_error()
        if err is not None:
            early_log(
                f"Error: {err}. Retry when the relay is back, or set "
                "NV_PLATFORM=cpu for a CPU run."
            )
            return 1

    # Must run before anything touches a JAX backend.
    if args.coordinator or args.num_hosts or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        from nnue_vision_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.process_id,
        )

    try:
        config = load_and_setup_config(args, args.model_type)
    except ConfigError as e:
        early_log(f"Error loading configuration: {e}")
        return 1

    from nnue_vision_tpu.training.loop import stop_cloud, train_model

    try:
        return train_model(config, args.model_type, wandb_run_id=args.wandb_run_id)
    except Exception as e:
        early_log(f"Unhandled exception in training: {e}")
        if not getattr(config, "keep_alive", False):
            stop_cloud("training crashed")
        raise


if __name__ == "__main__":
    sys.exit(main())
