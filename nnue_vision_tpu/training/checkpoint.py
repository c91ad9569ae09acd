"""Checkpoint management — best-F1 policy, local + tracker upload.

Parity with the reference CheckpointManager (checkpoint_manager.py:20-123):
best-val-F1-only upload (gating lives in the train loop, train.py:437-445),
local save/load, best-metric tracking. Checkpoints are msgpack-free pure
pickle of numpy pytrees + architecture config, so `serialize.py` can load
them without JAX (and without torch — the reference's .pt dependency is
replaced by a self-describing dict).

Checkpoint schema (mirrors checkpoint_manager.py:45-51):
  {"epoch", "model_type", "model_config", "params", "batch_stats",
   "opt_state", "metrics", "config_name"}
"""

from __future__ import annotations

import dataclasses
import pickle
import tempfile
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: Path,
    *,
    model_type: str,
    model_config: Any,
    params,
    epoch: int,
    metrics: Dict[str, float],
    batch_stats=None,
    opt_state=None,
    config_name: str = "",
) -> None:
    payload = {
        "epoch": epoch,
        "model_type": model_type,
        "model_config": dataclasses.asdict(model_config),
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats) if batch_stats is not None else None,
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "metrics": metrics,
        "config_name": config_name,
        "saved_at": time.time(),
        "format_version": 1,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.rename(path)


def load_checkpoint(path: Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


class CheckpointManager:
    """Best-metric checkpoint keeper with tracker upload."""

    def __init__(self, log_dir: str, run_name: str, run=None):
        self.dir = Path(log_dir) / "checkpoints" / run_name
        self.run = run
        self.best_metric: Optional[float] = None

    def is_better(self, value: float) -> bool:
        return self.best_metric is None or value > self.best_metric

    def save_best(
        self,
        *,
        model_type: str,
        model_config: Any,
        params,
        epoch: int,
        metrics: Dict[str, float],
        batch_stats=None,
        opt_state=None,
        config_name: str = "",
        metric_key: str = "val_f1",
    ) -> Optional[Path]:
        """Save (and upload) iff metrics[metric_key] improves; returns path."""
        value = metrics.get(metric_key)
        if value is None or not self.is_better(value):
            return None
        self.best_metric = value
        path = self.dir / "best_model.ckpt"
        save_checkpoint(
            path,
            model_type=model_type,
            model_config=model_config,
            params=params,
            epoch=epoch,
            metrics=metrics,
            batch_stats=batch_stats,
            opt_state=opt_state,
            config_name=config_name,
        )
        if self.run is not None:
            # Upload via a temp copy like the reference (checkpoint_manager.py:31-73)
            with tempfile.TemporaryDirectory() as td:
                staged = Path(td) / "best_model.ckpt"
                staged.write_bytes(path.read_bytes())
                self.run.save_file(staged)
        return path

    def save_local(self, name: str, **kwargs) -> Path:
        path = self.dir / name
        save_checkpoint(path, **kwargs)
        return path


# ---------------------------------------------------------------------------
# Orbax backend (opt-in; pod-scale async step checkpoints)
# ---------------------------------------------------------------------------
#
# The pickle format above stays the canonical artifact (serialize.py reads
# it without JAX). Orbax adds what pickle can't do at pod scale
# (ROADMAP #8 / VERDICT r1 item 10): ASYNC saves that overlap training,
# sharding-aware restore on multi-host meshes, and retention-managed step
# checkpoints for resume. Opt in with `config.checkpoint_backend="orbax"`.


class OrbaxStepCheckpointer:
    """Async, retention-managed step checkpoints via Orbax.

    Saves {"params", "opt_state", "batch_stats", "step"} per step index;
    `save` returns immediately (the write happens in the background) and
    `wait` / close blocks until durable. Metadata (model_type/config/
    metrics) travels as a JSON-able dict item alongside the pytree.
    """

    def __init__(self, directory: Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, *, params, opt_state=None, batch_stats=None,
             metadata: Optional[Dict[str, Any]] = None) -> None:
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(
                {
                    "params": params,
                    "opt_state": opt_state,
                    "batch_stats": batch_stats,
                }
            ),
            metadata=self._ocp.args.JsonSave(metadata or {}),
        )
        self.manager.save(step, args=args)

    def restore(self, step: Optional[int] = None, target=None):
        """Returns ({"params","opt_state","batch_stats"}, metadata dict).

        Pass `target` (a live {"params","opt_state","batch_stats"} pytree)
        to restore into the exact structure/shardings — required to get
        optax NamedTuple states back instead of plain nests.
        """
        step = self.manager.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {self.dir}")
        restore_args = (
            self._ocp.args.StandardRestore(target)
            if target is not None
            else self._ocp.args.StandardRestore()
        )
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                state=restore_args,
                metadata=self._ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["metadata"]

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()
