"""Run logging: early-log capture/replay + a W&B-compatible tracker.

The reference requires the `wandb` package and a WANDB_API_KEY
(train.py:577-580) and replays pre-init logs into the run
(training_utils.py:32-68). This module keeps that exact workflow but makes
the backend pluggable: if `wandb` is importable AND an API key is present
the real service is used; otherwise a local JSONL tracker under
`<log_dir>/runs/<run_name>/` records identical streams (config, scalar
metrics with steps, saved files), so training works in air-gapped
environments without changing call sites.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

_EARLY_LOGS: List[str] = []
_ACTIVE_RUN: Optional["Run"] = None


def early_log(message: str) -> None:
    """Print immediately and buffer for replay into the tracker
    (training_utils.py:32-48)."""
    print(message, flush=True)
    _EARLY_LOGS.append(f"{time.strftime('%H:%M:%S')} {message}")


def replay_early_logs() -> None:
    """Flush buffered early logs into the active run (training_utils.py:51-68)."""
    run = _ACTIVE_RUN
    if run is None:
        return
    for line in _EARLY_LOGS:
        run.log_text(line)
    _EARLY_LOGS.clear()


class Run:
    """A training run handle: wandb when available, local JSONL otherwise."""

    def __init__(self, project: str, config: Dict[str, Any],
                 run_id: Optional[str] = None, log_dir: str = "logs"):
        self.project = project
        self.config = config
        self._wandb = None
        self._step = 0

        if os.environ.get("WANDB_API_KEY") and os.environ.get("NV_NO_WANDB") != "1":
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, config=config, id=run_id,
                           resume="allow")
                self.name = wandb.run.name
                self.url = wandb.run.url
                self.dir = Path(wandb.run.dir)
                return
            except Exception as e:  # fall back to local tracking
                print(f"wandb unavailable ({e}); using local run tracking")

        self.name = run_id or f"run_{time.strftime('%Y%m%d_%H%M%S')}"
        self.dir = Path(log_dir) / "runs" / self.name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.url = f"file://{self.dir}"
        (self.dir / "config.json").write_text(
            json.dumps({k: repr(v) for k, v in config.items()}, indent=2)
        )
        self._metrics_file = open(self.dir / "metrics.jsonl", "a")

    def log(self, data: Dict[str, float], step: Optional[int] = None) -> None:
        if self._wandb is not None:
            self._wandb.log(data, step=step)
            return
        rec = {"step": step if step is not None else self._step,
               "time": time.time(), **data}
        self._metrics_file.write(json.dumps(rec) + "\n")
        self._metrics_file.flush()
        self._step = rec["step"] + 1

    def log_text(self, line: str) -> None:
        if self._wandb is not None:
            return  # wandb captures stdout already
        with open(self.dir / "log.txt", "a") as f:
            f.write(line + "\n")

    def save_file(self, path: Path) -> None:
        if self._wandb is not None:
            self._wandb.save(str(path))
            return
        shutil.copy2(path, self.dir / Path(path).name)

    def finish(self) -> None:
        global _ACTIVE_RUN
        if self._wandb is not None:
            self._wandb.finish()
        else:
            self._metrics_file.close()
        _ACTIVE_RUN = None


def init_run(project: str, config: Dict[str, Any],
             run_id: Optional[str] = None, log_dir: str = "logs") -> Run:
    global _ACTIVE_RUN
    _ACTIVE_RUN = Run(project, config, run_id=run_id, log_dir=log_dir)
    return _ACTIVE_RUN
