#!/usr/bin/env python3
"""Run MCU simulation + TinyML benchmarks on a trained checkpoint.

CLI parity with the upstream script (scripts/run_mcu_benchmarks.py
upstream): loads a checkpoint (or builds a fresh model), optional
Visual-Wake-Words binary remap, runs the MCU benchmark across Cortex-M
targets and the TinyML report, optional matplotlib Pareto plots, saves
JSON results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import asdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# MCU analysis is host-side math — pin the CPU backend (in-process,
# before any jax import; a shell env var alone does not win on hosts
# that pin JAX_PLATFORMS=axon) so the script neither contends for the
# single-tenant TPU nor hangs when the TPU tunnel is down. Previously
# inherited implicitly from serialize.py's module-level pin, which moved
# into serialize's __main__ path.
os.environ.setdefault("NV_PLATFORM", "cpu")
import jax

jax.config.update("jax_platforms", os.environ["NV_PLATFORM"])


def parse_arguments(argv=None):
    """Standalone arg parsing (upstream script surface)."""
    return _build_parser().parse_args(argv)


def load_model(args):
    from nnue_vision_tpu.models.api import NNUE
    from nnue_vision_tpu.models.nnue import GridFeatureSet

    if args.checkpoint:
        from serialize import load_checkpoint_auto

        model_type, params, batch_stats, cfg = load_checkpoint_auto(
            Path(args.checkpoint)
        )
        if model_type != "nnue":
            from nnue_vision_tpu.models.api import EtinyNet

            m = EtinyNet(variant=cfg.variant, num_classes=cfg.num_classes,
                         input_size=cfg.input_size)
            m.params, m.batch_stats = params, batch_stats
            return m
        m = NNUE(feature_set=cfg.feature_set, l1_size=cfg.l1_size,
                 l2_size=cfg.l2_size, l3_size=cfg.l3_size,
                 num_classes=cfg.num_classes, input_size=cfg.input_size)
        m.params = params
        return m
    return NNUE(
        feature_set=GridFeatureSet(args.grid_size, args.features_per_square),
        l1_size=args.l1_size, l2_size=args.l2_size, l3_size=args.l3_size,
        num_classes=2 if args.visual_wake_words else args.num_classes,
        input_size=args.input_size,
    )


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="MCU/TinyML benchmark runner")
    parser.add_argument("--checkpoint", type=str, help="trained checkpoint (.ckpt)")
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--max-samples", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--target-sparsity", type=float, default=0.5)
    parser.add_argument("--visual-wake-words", action="store_true",
                        help="binary person/no-person remap (airplane proxy class)")
    parser.add_argument("--output-dir", type=Path, default=Path("benchmark_results"))
    parser.add_argument("--plots", action="store_true",
                        help="write Pareto plots (requires matplotlib)")
    # fresh-model architecture knobs
    parser.add_argument("--grid-size", type=int, default=10)
    parser.add_argument("--features-per-square", type=int, default=8)
    parser.add_argument("--l1-size", type=int, default=1024)
    parser.add_argument("--l2-size", type=int, default=128)
    parser.add_argument("--l3-size", type=int, default=32)
    parser.add_argument("--num-classes", type=int, default=10)
    parser.add_argument("--input-size", type=int, default=32)
    return parser


def main() -> int:
    args = parse_arguments()

    from benchmarks import (
        MCU_SPECS,
        create_pareto_plot_data,
        generate_tinyml_report,
        run_mcu_benchmark,
    )
    from nnue_vision_tpu.data.loaders import create_data_loaders

    binary = (
        {"positive_classes": ["airplane"]} if args.visual_wake_words else None
    )
    _, _, test_loader = create_data_loaders(
        dataset_name=args.dataset,
        batch_size=args.batch_size,
        max_samples_per_split=args.max_samples,
        use_augmentation=False,
        binary_classification=binary,
    )

    model = load_model(args)
    print(f"Model: {model.count_parameters():,} parameters")

    results = run_mcu_benchmark(
        model=model,
        data_loader=test_loader,
        mcu_specs=list(MCU_SPECS.values()),
        target_sparsity=args.target_sparsity,
        verbose=True,
    )

    args.output_dir.mkdir(parents=True, exist_ok=True)
    mcu_path = args.output_dir / "mcu_benchmark.json"
    with open(mcu_path, "w") as f:
        json.dump(
            {"model_stats": asdict(results["model_stats"]),
             "mcu_results": results["mcu_results"]},
            f, indent=2, default=str,
        )
    print(f"MCU results → {mcu_path}")

    report_path = args.output_dir / "tinyml_report.json"
    report = generate_tinyml_report(
        model=model,
        dataset_name="visual_wake_words" if args.visual_wake_words else args.dataset,
        data_loader=test_loader,
        mcu_specs=list(MCU_SPECS.values()),
        output_path=report_path,
    )
    print(f"TinyML report → {report_path} "
          f"(best: {report['summary']['best_platform']}, "
          f"{report['summary']['best_latency_ms']:.2f} ms)")

    if args.plots:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            data = create_pareto_plot_data(report["mlperf_results"])
            fig, ax = plt.subplots(figsize=(7, 5))
            for pt in data["nnue_models"]:
                ax.scatter(pt["x"], pt["y"], c="tab:blue", label="NNUE-Vision")
                ax.annotate(pt["name"], (pt["x"], pt["y"]), fontsize=7)
            for pt in data["baseline_models"]:
                ax.scatter(pt["x"], pt["y"], c="tab:red", marker="x")
                ax.annotate(pt["name"], (pt["x"], pt["y"]), fontsize=7)
            ax.set_xlabel("latency (ms)")
            ax.set_ylabel("accuracy")
            ax.set_xscale("log")
            fig.savefig(args.output_dir / "pareto.png", dpi=150)
            print(f"Pareto plot → {args.output_dir / 'pareto.png'}")
        except ImportError:
            print("matplotlib not available; skipping plots")
    return 0


if __name__ == "__main__":
    sys.exit(main())
