"""Cloud launcher tests — dry-run backend, git gating, bootstrap contents
(upstream tests/test_runpod_service.py analog, fully offline)."""

import subprocess

import pytest

from nnue_vision_tpu.cloud.launcher import (
    BACKENDS,
    CloudError,
    LaunchSpec,
    check_git_status,
    make_bootstrap_script,
    start_cloud_training,
    stop_instance,
)


class FakeRun:
    name = "fake-run-1"

    def __init__(self):
        self.saved = []


def test_check_git_status_clean_repo():
    # this repo is a git repo; the call must return a commit hash or raise
    # CloudError about dirtiness — both acceptable, never other errors.
    try:
        commit = check_git_status()
        assert len(commit) == 40
    except CloudError as e:
        assert "dirty" in str(e)


def test_dirty_tree_rejected(tmp_path, monkeypatch):
    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    (tmp_path / "f.txt").write_text("x")
    monkeypatch.chdir(tmp_path)
    with pytest.raises(CloudError, match="dirty|repository"):
        check_git_status()


def test_bootstrap_script_contents():
    script = make_bootstrap_script(
        "https://example.com/repo.git", "abc123", "nnue", "run-42",
        config="config/train_nnue.py", extra_args="--batch_size 64",
    )
    assert "git clone" in script
    assert "git checkout abc123" in script
    assert "python train.py nnue" in script
    assert "--wandb-run-id=run-42" in script
    assert "--batch_size 64" in script
    assert "ninja -C engine/build" in script


def test_bootstrap_script_quotes_safely():
    script = make_bootstrap_script(
        "https://example.com/r.git", "abc", "nnue", "run; rm -rf /",
    )
    assert "'run; rm -rf /'" in script  # shell-quoted, not interpolated


def test_start_cloud_training_dryrun(monkeypatch, capsys):
    monkeypatch.setattr(
        "nnue_vision_tpu.cloud.launcher.check_git_status", lambda: "deadbeef"
    )
    spec = LaunchSpec(model_type="nnue", config="config/train_nnue.py",
                      repo_url="https://example.com/repo.git")
    info = start_cloud_training(spec, backend="dryrun", run=FakeRun())
    assert info["state"] == "dryrun"
    assert info["commit"] == "deadbeef"
    assert info["run"] == "fake-run-1"
    out = capsys.readouterr().out
    assert "would create TPU-VM" in out


def test_unknown_backend_rejected(monkeypatch):
    monkeypatch.setattr(
        "nnue_vision_tpu.cloud.launcher.check_git_status", lambda: "deadbeef"
    )
    spec = LaunchSpec(model_type="nnue")
    with pytest.raises(CloudError, match="unknown backend"):
        start_cloud_training(spec, backend="aws", run=FakeRun())


def test_stop_instance_noop_without_env(monkeypatch):
    monkeypatch.delenv("NV_INSTANCE_NAME", raising=False)
    stop_instance("test")  # must be a silent no-op locally


# ---------------------------------------------------------------------------
# gcloud argv goldens (VERDICT r3 #10): the real provider can't be exercised
# on this host, so the exact CLI shape is pinned. If gcloud's TPU-VM surface
# (or our construction of it) drifts, these fail with a readable diff.
# Pinned against `gcloud compute tpus tpu-vm create/delete` as of 2026.
# ---------------------------------------------------------------------------

def test_gcloud_create_argv_golden():
    from nnue_vision_tpu.cloud.launcher import gcloud_create_argv

    spec = LaunchSpec(
        model_type="nnue", accelerator="v5litepod-8", zone="us-east5-b",
        name="nv-train-golden",
    )
    assert gcloud_create_argv(spec, "#!/bin/bash\necho hi") == [
        "gcloud", "compute", "tpus", "tpu-vm", "create", "nv-train-golden",
        "--zone=us-east5-b",
        "--accelerator-type=v5litepod-8",
        "--version=tpu-ubuntu2204-base",
        "--metadata=startup-script=#!/bin/bash\necho hi",
    ]


def test_gcloud_delete_argv_golden():
    from nnue_vision_tpu.cloud.launcher import gcloud_delete_argv

    assert gcloud_delete_argv("nv-train-golden", "us-east5-b") == [
        "gcloud", "compute", "tpus", "tpu-vm", "delete", "nv-train-golden",
        "--zone=us-east5-b", "--quiet",
    ]


def test_gcloud_backend_invokes_pinned_argv(monkeypatch):
    """End-to-end through start_cloud_training with the gcloud backend,
    subprocess mocked: the argv handed to subprocess.run must be exactly
    the golden construction, with the bootstrap script inline in the
    startup-script metadata."""
    from nnue_vision_tpu.cloud import launcher

    calls = []

    class Res:
        returncode = 0
        stdout = ""
        stderr = ""

    def fake_run(cmd, **kwargs):
        calls.append(cmd)
        return Res()

    monkeypatch.setattr(launcher, "check_git_status", lambda: "deadbeef")
    monkeypatch.setattr(launcher.subprocess, "run", fake_run)
    spec = LaunchSpec(model_type="etinynet", name="nv-x", zone="z",
                      accelerator="a", repo_url="https://example.com/r.git")
    info = start_cloud_training(spec, backend="gcloud", run=FakeRun())
    assert info == {"instance": "nv-x", "state": "creating",
                    "run": "fake-run-1", "commit": "deadbeef"}
    (cmd,) = calls
    script = make_bootstrap_script(
        "https://example.com/r.git", "deadbeef", "etinynet", "fake-run-1"
    )
    assert cmd == launcher.gcloud_create_argv(spec, script)
    assert cmd[:6] == ["gcloud", "compute", "tpus", "tpu-vm", "create",
                       "nv-x"]


def test_gcloud_backend_create_failure_raises(monkeypatch):
    from nnue_vision_tpu.cloud import launcher

    class Res:
        returncode = 1
        stdout = ""
        stderr = "quota exceeded"

    monkeypatch.setattr(launcher, "check_git_status", lambda: "deadbeef")
    monkeypatch.setattr(
        launcher.subprocess, "run", lambda *a, **k: Res()
    )
    spec = LaunchSpec(model_type="nnue", repo_url="u")
    with pytest.raises(CloudError, match="quota exceeded"):
        start_cloud_training(spec, backend="gcloud", run=FakeRun())


def test_stop_instance_uses_pinned_delete_argv(monkeypatch):
    from nnue_vision_tpu.cloud import launcher

    calls = []

    class Res:
        returncode = 0
        stdout = ""
        stderr = ""

    monkeypatch.setattr(
        launcher.subprocess, "run",
        lambda cmd, **k: calls.append(cmd) or Res(),
    )
    monkeypatch.setenv("NV_INSTANCE_NAME", "nv-train-golden")
    monkeypatch.setenv("NV_TPU_ZONE", "us-east5-b")
    stop_instance("done")
    assert calls == [launcher.gcloud_delete_argv("nv-train-golden",
                                                 "us-east5-b")]
