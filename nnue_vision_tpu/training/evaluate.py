"""Evaluation: JAX float path, JAX int8-sim path, and C++ engine path.

Upstream surface parity (evaluate.py:23-434 upstream): compute_metrics,
evaluate_model, evaluate_compiled_model (same metric dict incl.
ms_per_sample and latent_density, same NNUE_ENGINE_EXEC / ETINY_ENGINE_EXEC
overrides, same failure-repro persistence to logs/compiled_eval_failures/).

Performance redesign: upstream runs ONE SUBPROCESS PER IMAGE and reloads
the model file every time (evaluate.py:171 upstream — the dominant eval
cost, §3.2 of SURVEY.md). Here the whole split is written as one
contiguous buffer and evaluated by a single engine process in batch mode;
additionally `evaluate_int8_sim` computes the SAME logits bit-exactly on
the TPU in one launch (engine_sim), which the train loop uses for
per-epoch compiled metrics, reserving the subprocess path for timing and
cross-checks.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import time
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from nnue_vision_tpu.data.augment import normalize_images
from nnue_vision_tpu.formats import write_etiny, write_nnue
from nnue_vision_tpu.ops.engine_sim import (
    conv_inputs_bf16_safe,
    etiny_engine_forward,
    etiny_sim_params,
    nnue_engine_forward,
    nnue_sim_params,
)
from nnue_vision_tpu.training.metrics import compute_metrics
from nnue_vision_tpu.training.step import eval_step

REPO_ROOT = Path(__file__).resolve().parent.parent.parent


class ResidentEvalLoader:
    """Pre-normalized, device-resident eval split: upload ONCE, slice on
    device every epoch.

    Two reasons to exist: (1) per-epoch evals re-uploaded the whole split
    every epoch (train+2×val ≈ 370 MB/epoch on a 20k-image task); on
    tunneled TPU backends each host→device transfer leaks its host staging
    buffer, which OOM-killed a 400-epoch run at 130 GB RSS — resident
    slices make per-epoch eval traffic O(logits). (2) it removes the
    upload from the eval critical path entirely.

    Yields (device_images_normalized, host_labels) batches; marked with
    `device_resident = True` so evaluate_model / evaluate_int8_sim skip
    their own normalization. The bf16-safety decision needs only the
    split's max|x| (engine_sim.conv_inputs_bf16_safe), precomputed here
    host-side before the upload.
    """

    device_resident = True

    def __init__(self, loader, batch_size=None):
        import jax

        from nnue_vision_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

        self.dataset = loader.dataset
        # eval can use a larger batch than training (fewer device
        # dispatches; resident slicing makes the batch size free) — each
        # new shape costs one compile, amortized across epochs
        self.batch_size = int(batch_size or loader.batch_size)
        self.drop_last = bool(getattr(loader, "drop_last", False))
        imgs = np.asarray(loader.dataset.images, np.float32)
        normed = (imgs - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32
        )
        self.max_abs = float(np.max(np.abs(normed))) if normed.size else 0.0
        self._images = jax.device_put(normed)
        self._labels = np.asarray(loader.dataset.labels)

    def __len__(self) -> int:
        n = len(self._labels)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self._labels)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            end = min(start + self.batch_size, n)
            yield self._images[start:end], self._labels[start:end]


def maybe_resident(loader, max_bytes, batch_size=None):
    """Wrap `loader` in a ResidentEvalLoader iff ITS OWN split fits the
    device-residency byte cap (each split is gated independently — the
    train loader may be a head-subset view far smaller than the full
    dataset, and the test split can exceed the cap while val does not)."""
    if loader.dataset.images.nbytes <= max_bytes:
        return ResidentEvalLoader(loader, batch_size=batch_size)
    return loader


def engine_executable(model_type: str) -> Path:
    """Engine binary path with the upstream env overrides."""
    if model_type == "nnue":
        override = os.environ.get("NNUE_ENGINE_EXEC")
        default = REPO_ROOT / "engine" / "build" / "nnue_inference"
    elif model_type == "etinynet":
        override = os.environ.get("ETINY_ENGINE_EXEC")
        default = REPO_ROOT / "engine" / "build" / "etinynet_inference"
    else:
        raise ValueError(f"unknown model type: {model_type}")
    return Path(override) if override else default


def evaluate_model(
    params, batch_stats, loader, *, model_type: str, model_cfg
) -> Tuple[float, Dict[str, float]]:
    """Float-path evaluation on device: (mean loss per batch, metrics)."""
    total_loss, n_batches = 0.0, 0
    outs, targets = [], []
    resident = getattr(loader, "device_resident", False)
    for images, labels in loader:
        x = images if resident else normalize_images(np.asarray(images))
        loss, logits = eval_step(
            params, batch_stats, x, labels, model_type=model_type, model_cfg=model_cfg
        )
        total_loss += float(loss) / len(labels)
        n_batches += 1
        outs.append(np.asarray(logits))
        targets.append(labels)
    if not outs:
        # A drop_last train loader with fewer samples than one batch
        # yields nothing; fail with a diagnosis instead of a bare
        # numpy concatenate error deep in the epoch loop.
        raise ValueError(
            f"evaluation loader produced 0 batches (dataset of "
            f"{len(loader.dataset.labels)} samples, batch_size "
            f"{loader.batch_size}, drop_last={loader.drop_last}) — "
            "reduce batch_size or raise max_samples/subset"
        )
    outputs = np.concatenate(outs)
    metrics = compute_metrics(outputs, np.concatenate(targets))
    return total_loss / max(1, n_batches), metrics


def _quantize(params, batch_stats, model_type, model_cfg):
    if model_type == "nnue":
        from nnue_vision_tpu.models.nnue import nnue_quantize

        return nnue_quantize(params, model_cfg)
    from nnue_vision_tpu.models.etinynet import etinynet_quantize

    return etinynet_quantize(params, batch_stats, model_cfg)


def evaluate_int8_sim(
    params, batch_stats, loader, *, model_type: str, model_cfg,
    use_pallas: bool = False,
) -> Dict[str, float]:
    """Bit-exact engine arithmetic on the TPU (fast compiled metrics).

    Produces the same logits the C++ engine would (proven by
    tests/test_engine_parity.py), so accuracy/F1 equal the subprocess
    path's; ms_per_sample here measures the TPU batch path. use_pallas=True
    routes NNUE through the fused Pallas head; use_pallas="mega" routes
    through the single-kernel megafused pipeline (same bits, fastest —
    see ops/pallas_kernels.py). EtinyNet has no Pallas variant.
    """
    q = _quantize(params, batch_stats, model_type, model_cfg)
    outs, targets, densities = [], [], []
    t0 = time.perf_counter()
    n = 0
    resident = getattr(loader, "device_resident", False)
    if model_type == "nnue":
        sim_params, cfg = nnue_sim_params(q)
        if use_pallas == "mega":
            # single-kernel pipeline (image → logits); bf16-exactness
            # precondition |qx| ≤ 256 is checked per batch below and the
            # batch falls back to the XLA sim if violated
            import jax as _jax

            from nnue_vision_tpu.ops.pallas_kernels import (
                mega_head_params,
                nnue_engine_forward_mega,
            )

            _interp = _jax.devices()[0].platform == "cpu"
            _mega_heads = {}

            def fwd(x, h, w, cm):
                if cm != "bf16":  # precondition failed → exact XLA path
                    return nnue_engine_forward(
                        sim_params, x, cfg=cfg, image_h=h, image_w=w,
                        conv_mode="f32",
                    )
                if (h, w) not in _mega_heads:
                    _mega_heads[(h, w)] = mega_head_params(
                        sim_params, cfg, h, w
                    )
                # x is already a device array; row-major flatten is free
                flat = x.reshape(x.shape[0], -1)
                return nnue_engine_forward_mega(
                    _mega_heads[(h, w)], flat, cfg=cfg, image_h=h,
                    image_w=w, interpret=_interp,
                )
        elif use_pallas:
            from nnue_vision_tpu.ops.pallas_kernels import (
                nnue_engine_forward_fused,
                pallas_head_params,
            )

            head = pallas_head_params(sim_params)
            fwd = lambda x, h, w, cm: nnue_engine_forward_fused(  # noqa: E731
                sim_params, head, x, cfg=cfg, image_h=h, image_w=w,
                conv_mode=cm,
            )
        else:
            fwd = lambda x, h, w, cm: nnue_engine_forward(  # noqa: E731
                sim_params, x, cfg=cfg, image_h=h, image_w=w, conv_mode=cm
            )
        for images, labels in loader:
            x = images if resident else normalize_images(np.asarray(images))
            h, w = x.shape[1], x.shape[2]
            # bf16 conv feeds when bit-exact for this batch (host check;
            # ~3x faster frontend), f32 otherwise — same logits either way.
            # Resident loaders precompute the split max|x| so no per-batch
            # device→host readback is needed.
            cm = "bf16" if conv_inputs_bf16_safe(
                loader.max_abs if resident else x, cfg.conv_scale
            ) else "f32"
            logits, _, count = fwd(x, h, w, cm)
            outs.append(np.asarray(logits))
            targets.append(labels)
            densities.append(
                np.asarray(count, np.float32) / np.float32(q.num_features)
            )
            n += len(labels)
    else:
        sim_params, cfg = etiny_sim_params(q)
        for images, labels in loader:
            x = images if resident else normalize_images(np.asarray(images))
            h, w = x.shape[1], x.shape[2]
            cm = "bf16" if conv_inputs_bf16_safe(
                loader.max_abs if resident else x, cfg.stem_scale
            ) else "f32"
            logits = etiny_engine_forward(
                sim_params, x, cfg=cfg, image_h=h, image_w=w, conv_mode=cm
            )
            outs.append(np.asarray(logits))
            targets.append(labels)
            n += len(labels)
    elapsed = time.perf_counter() - t0

    metrics = compute_metrics(np.concatenate(outs), np.concatenate(targets))
    metrics["ms_per_sample"] = (elapsed / max(1, n)) * 1000.0
    metrics["latent_density"] = (
        float(np.concatenate(densities).mean()) if densities else 0.0
    )
    return metrics


def _persist_failure(model_path, image_path, cmd) -> Path:
    """Persist model+images+repro script on engine failure
    (upstream evaluate.py:229-257)."""
    root = Path("logs/compiled_eval_failures") / datetime.now().strftime(
        "%Y%m%d_%H%M%S_%f"
    )
    root.mkdir(parents=True, exist_ok=True)
    saved_model = root / Path(model_path).name
    saved_image = root / Path(image_path).name
    saved_model.write_bytes(Path(model_path).read_bytes())
    saved_image.write_bytes(Path(image_path).read_bytes())
    repro = root / "repro.sh"
    repro.write_text(
        "#!/usr/bin/env bash\nset -euo pipefail\n"
        + " ".join(str(c) for c in cmd).replace(str(model_path), str(saved_model))
        .replace(str(image_path), str(saved_image))
        + "\n"
    )
    os.chmod(repro, 0o755)
    return root


def evaluate_compiled_model(
    params, batch_stats, loader, *, model_type: str, model_cfg,
    executable: Optional[Path] = None,
) -> Dict[str, float]:
    """Serialize → run the C++ engine in batch mode → metrics.

    Returns the upstream metric dict: acc/f1/precision/recall +
    ms_per_sample (engine wall-clock per image) + latent_density.
    """
    exe = Path(executable) if executable else engine_executable(model_type)
    if not exe.exists():
        raise RuntimeError(
            f"C++ engine not found: {exe}. Build with "
            "`cmake -S engine -B engine/build -G Ninja && ninja -C engine/build`."
        )

    q = _quantize(params, batch_stats, model_type, model_cfg)
    suffix = ".nnue" if model_type == "nnue" else ".etiny"
    model_path = Path(tempfile.mktemp(suffix=suffix))
    if model_type == "nnue":
        write_nnue(q, model_path)
    else:
        write_etiny(q, model_path)

    try:
        outs, targets, densities = [], [], []
        total_time, total_n = 0.0, 0
        for images, labels in loader:
            x = np.ascontiguousarray(
                np.asarray(normalize_images(np.asarray(images))), np.float32
            )
            n, h, w = x.shape[0], x.shape[1], x.shape[2]
            image_path = Path(tempfile.mktemp(suffix=".bin"))
            x.tofile(image_path)
            cmd = [str(exe), str(model_path), str(image_path), str(h), str(w), str(n)]
            try:
                t0 = time.perf_counter()
                result = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=600
                )
                total_time += time.perf_counter() - t0
                total_n += n
                if result.returncode != 0:
                    where = _persist_failure(model_path, image_path, cmd)
                    raise RuntimeError(
                        f"engine failed (rc={result.returncode}): {result.stderr}\n"
                        f"repro persisted to {where}"
                    )
                if model_type == "nnue":
                    for line in result.stdout.strip().splitlines():
                        parts = line.split(",")
                        outs.append([float(v) for v in parts[:-1]])
                        densities.append(float(parts[-1]))
                else:
                    current: list = []
                    for line in result.stdout.splitlines():
                        if line.startswith("IMAGE") and current:
                            outs.append(current)
                            current = []
                        elif line.startswith("RESULT_"):
                            current.append(float(line.split(":", 1)[1]))
                    if current:
                        outs.append(current)
                targets.append(labels)
            finally:
                image_path.unlink(missing_ok=True)

        if not outs:
            raise RuntimeError("no engine outputs produced")
        outputs = np.asarray(outs, np.float32)
        metrics = compute_metrics(outputs, np.concatenate(targets))
        metrics["ms_per_sample"] = (total_time / max(1, total_n)) * 1000.0
        metrics["latent_density"] = (
            float(np.mean(densities)) if densities else 0.0
        )
        return metrics
    finally:
        model_path.unlink(missing_ok=True)


def evaluate_model_comprehensive(
    params, batch_stats, loader, *, model_type: str, model_cfg,
    include_compiled: bool = True,
) -> Dict[str, dict]:
    """Float + compiled evaluation bundle (upstream evaluate.py:403-431)."""
    loss, metrics = evaluate_model(
        params, batch_stats, loader, model_type=model_type, model_cfg=model_cfg
    )
    results = {"float": {"loss": loss, "metrics": metrics}}
    if include_compiled:
        results["compiled"] = {
            "metrics": evaluate_compiled_model(
                params, batch_stats, loader,
                model_type=model_type, model_cfg=model_cfg,
            )
        }
    return results
