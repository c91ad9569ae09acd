"""Multi-host (DCN) tests: 2 real OS processes, 4 virtual CPU devices each,
wired by jax.distributed into one 8-device runtime (VERDICT r1 item 8;
SURVEY.md §2.15 DCN row). The workers compute one data-parallel train step
on a global batch fed per-host via host_batch_to_global; the test asserts
both processes report the same loss as a single-process 8-device run."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import os, sys
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, sys.argv[3])

    from nnue_vision_tpu.parallel.distributed import (
        host_batch_to_global, initialize_distributed, make_global_mesh,
        process_local_slice,
    )
    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
    from nnue_vision_tpu.training.optim import create_optimizer
    from nnue_vision_tpu.training.step import make_train_state, train_step

    class OptCfg:
        learning_rate = 0.01; weight_decay = 0.0; momentum = 0.9
        optimizer_type = "sgd"; max_grad_norm = 1.0
        use_cosine_scheduler = False; max_epochs = 1
        decay_lr = False; use_cyclical_lr = False

    CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    mesh = make_global_mesh(("data",))
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=1)
    params = nnue_init(jax.random.PRNGKey(0), CFG)
    state = make_train_state(params, optimizer)
    repl = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    # identical global batch on every host; each feeds only its local slice
    rng = np.random.default_rng(123)
    images = rng.random((16, 16, 16, 3), dtype=np.float32)
    labels = rng.integers(0, 3, 16).astype(np.int64)
    lo, hi = process_local_slice(16)
    with mesh:
        gi, gl = host_batch_to_global(mesh, (images[lo:hi], labels[lo:hi]))
        state, metrics = train_step(state, gi, gl, model_type="nnue",
                                    model_cfg=CFG, optimizer=optimizer)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    fc1 = np.asarray(jax.device_get(state.params["fc1_w"]))
    print(f"RESULT:{pid}:{loss:.8f}:{float(fc1.sum()):.8f}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_matches_single_process(tmp_path, rng):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT:"):
                _, pid, loss, fc1 = line.split(":")
                results[int(pid)] = (float(loss), float(fc1))
    assert set(results) == {0, 1}, results
    # both processes observe the same global loss and same updated params
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # single-process 8-device reference (this test process has 8 virtual
    # devices from conftest)
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
    from nnue_vision_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from nnue_vision_tpu.training.optim import create_optimizer
    from nnue_vision_tpu.training.step import make_train_state, train_step

    class OptCfg:
        learning_rate = 0.01; weight_decay = 0.0; momentum = 0.9
        optimizer_type = "sgd"; max_grad_norm = 1.0
        use_cosine_scheduler = False; max_epochs = 1
        decay_lr = False; use_cyclical_lr = False

    CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    mesh = make_mesh(8)
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=1)
    state = replicate(mesh, make_train_state(nnue_init(jax.random.PRNGKey(0), CFG),
                                             optimizer))
    data_rng = np.random.default_rng(123)
    images = data_rng.random((16, 16, 16, 3), dtype=np.float32)
    labels = data_rng.integers(0, 3, 16).astype(np.int64)
    gi, gl = shard_batch(mesh, (images, labels))
    state, metrics = train_step(state, gi, gl, model_type="nnue",
                                model_cfg=CFG, optimizer=optimizer)
    ref_loss = float(metrics["loss"])
    ref_fc1 = float(np.asarray(state.params["fc1_w"]).sum())

    assert results[0][0] == pytest.approx(ref_loss, rel=1e-5)
    assert results[0][1] == pytest.approx(ref_fc1, rel=1e-5)


def test_initialize_noop_without_config(monkeypatch):
    """No coordinator/env configured → silently single-host (the default
    path every local run takes)."""
    from nnue_vision_tpu.parallel.distributed import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    initialize_distributed()  # must not raise or re-init
    assert jax.process_count() == 1


def test_process_local_slice_single_process():
    from nnue_vision_tpu.parallel.distributed import process_local_slice

    assert process_local_slice(10) == (0, 10)


def test_host_batch_to_global_single_process(rng):
    """Degenerate single-process case: global array == local array."""
    from nnue_vision_tpu.parallel.distributed import (
        host_batch_to_global, make_global_mesh,
    )

    mesh = make_global_mesh(("data",))
    x = rng.random((16, 4), dtype=np.float32)
    g = host_batch_to_global(mesh, x)
    assert g.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(g), x)
