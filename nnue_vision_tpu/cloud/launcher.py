"""Cloud training launcher — TPU-VM analog of the upstream RunPod service.

Workflow parity with nnue_runpod_service.py:112-240 upstream:
  1. refuse to launch from a dirty git tree (:47-66),
  2. pre-create the experiment-tracker run locally so the instance resumes
     it by id (:152-167),
  3. compose a bootstrap script that clones the repo at the current commit
     and runs `train.py <model_type> --wandb-run-id=<id>` (:100-110),
  4. create the instance through a provider backend,
  5. `stop_instance` for end-of-training auto-shutdown (:209-240).

Provider backends are pluggable callables; the default `gcloud` backend
shells out to the gcloud CLI when present (TPU-VM creation), and a `dryrun`
backend prints the exact commands — used by tests and air-gapped machines.
No provider SDK is imported at module load.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

DEFAULT_IMAGE = "tpu-ubuntu2204-base"
DEFAULT_ACCELERATOR = "v5litepod-1"


class CloudError(RuntimeError):
    pass


def check_git_status() -> str:
    """Refuse to launch with uncommitted changes; returns current commit."""
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True
    )
    if dirty.returncode != 0:
        raise CloudError("not a git repository")
    if dirty.stdout.strip():
        raise CloudError(
            "git tree is dirty — commit or stash before launching cloud "
            f"training:\n{dirty.stdout}"
        )
    rev = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    )
    return rev.stdout.strip()


def make_bootstrap_script(
    repo_url: str, commit: str, model_type: str, run_id: str,
    config: Optional[str] = None, extra_args: str = "",
) -> str:
    """The instance-side bootstrap (upstream container_setup.sh workflow)."""
    config_arg = f"--config {shlex.quote(config)}" if config else ""
    return "\n".join(
        [
            "#!/usr/bin/env bash",
            "set -euo pipefail",
            "mkdir -p /workspace && cd /workspace",
            f"git clone {shlex.quote(repo_url)} repo || (cd repo && git fetch)",
            "cd repo",
            f"git checkout {shlex.quote(commit)}",
            "cmake -S engine -B engine/build -G Ninja -DCMAKE_BUILD_TYPE=Release",
            "ninja -C engine/build",
            f"python train.py {shlex.quote(model_type)} {config_arg} "
            f"--wandb-run-id={shlex.quote(run_id)} {extra_args}".strip(),
        ]
    )


@dataclass
class LaunchSpec:
    model_type: str
    config: Optional[str] = None
    accelerator: str = DEFAULT_ACCELERATOR
    zone: str = os.environ.get("NV_TPU_ZONE", "us-central1-a")
    name: str = field(default_factory=lambda: f"nv-train-{int(time.time())}")
    repo_url: str = ""
    extra_args: str = ""
    keep_alive: bool = False


def _backend_dryrun(spec: LaunchSpec, script: str) -> Dict[str, str]:
    print(f"[dryrun] would create TPU-VM {spec.name} ({spec.accelerator}, "
          f"{spec.zone}) and run:\n{script}")
    return {"instance": spec.name, "state": "dryrun"}


def gcloud_create_argv(spec: LaunchSpec, script: str) -> list[str]:
    """The exact `gcloud compute tpus tpu-vm create` argv.

    Pure so tests can pin it against a golden (no real provider on this
    host — the golden is the drift detector for the TPU-VM CLI shape:
    https://cloud.google.com/sdk/gcloud/reference/compute/tpus/tpu-vm/create).
    """
    return [
        "gcloud", "compute", "tpus", "tpu-vm", "create", spec.name,
        f"--zone={spec.zone}", f"--accelerator-type={spec.accelerator}",
        f"--version={DEFAULT_IMAGE}",
        f"--metadata=startup-script={script}",
    ]


def gcloud_delete_argv(name: str, zone: str) -> list[str]:
    """The exact `gcloud compute tpus tpu-vm delete` argv (see above)."""
    return [
        "gcloud", "compute", "tpus", "tpu-vm", "delete", name,
        f"--zone={zone}", "--quiet",
    ]


def _backend_gcloud(spec: LaunchSpec, script: str) -> Dict[str, str]:
    res = subprocess.run(
        gcloud_create_argv(spec, script),
        capture_output=True, text=True, timeout=600,
    )
    if res.returncode != 0:
        raise CloudError(f"gcloud create failed: {res.stderr}")
    return {"instance": spec.name, "state": "creating"}


BACKENDS: Dict[str, Callable[[LaunchSpec, str], Dict[str, str]]] = {
    "dryrun": _backend_dryrun,
    "gcloud": _backend_gcloud,
}


def start_cloud_training(
    spec: LaunchSpec, backend: str = "dryrun", run=None
) -> Dict[str, str]:
    """Validate git state, pre-create the tracker run, launch the instance."""
    commit = check_git_status()
    if run is None:
        from nnue_vision_tpu.training.logging import init_run

        run = init_run(
            project=f"nnue_vision_tpu_{spec.model_type}",
            config={"launch": spec.name, "commit": commit},
        )
    repo_url = spec.repo_url or subprocess.run(
        ["git", "remote", "get-url", "origin"], capture_output=True, text=True
    ).stdout.strip() or "."
    script = make_bootstrap_script(
        repo_url, commit, spec.model_type, run.name,
        config=spec.config, extra_args=spec.extra_args,
    )
    if backend not in BACKENDS:
        raise CloudError(f"unknown backend {backend}; have {list(BACKENDS)}")
    info = BACKENDS[backend](spec, script)
    info["run"] = run.name
    info["commit"] = commit
    return info


def stop_instance(reason: str = "") -> None:
    """Stop the instance this process runs on, if cloud metadata says so.

    Upstream stops its RunPod pod via env-provided id (RUNPOD_POD_ID,
    nnue_runpod_service.py:209-240). Here NV_INSTANCE_NAME/NV_TPU_ZONE play
    that role for gcloud; silently a no-op when unset (local runs).
    """
    name = os.environ.get("NV_INSTANCE_NAME")
    if not name:
        return
    zone = os.environ.get("NV_TPU_ZONE", "us-central1-a")
    print(f"Stopping instance {name} ({reason})")
    subprocess.run(
        gcloud_delete_argv(name, zone),
        capture_output=True, text=True, timeout=600,
    )
