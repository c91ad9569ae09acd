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
