#!/usr/bin/env python3
"""EtinyNet production train-step throughput probe (round 5).

Measures the bench.py EtinyNet unit (0.98M variant, batch 1024, heavy
augmentation, scanned steps/dispatch) plus the no-aug bound, so the
round-5 warp-kernel work is visible in the same contract the driver
records. Timing: chained dispatches, readback-forced, best of 3.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.models.etinynet import EtinyNetConfig, etinynet_init
from nnue_vision_tpu.training.optim import create_optimizer
from nnue_vision_tpu.training.step import make_train_state, scanned_train_steps


class OptCfg:
    learning_rate = 0.01
    weight_decay = 2e-4
    momentum = 0.9
    optimizer_type = "sgd"
    max_grad_norm = 1.0
    use_cosine_scheduler = True
    max_epochs = 300
    decay_lr = True
    use_cyclical_lr = False


def measure(strength, augment, batch=1024, spd=16, dispatches=10):
    rng = np.random.default_rng(0)
    n_data = 8192
    device_images = jnp.asarray(
        rng.random((n_data, 32, 32, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 10, n_data).astype(np.int64))
    cfg = EtinyNetConfig(variant="0.98M", num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(3), cfg)
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=97)
    state = make_train_state(params, optimizer, stats)
    key = jax.random.PRNGKey(4)

    def dispatch(st, k, idx_chunk):
        k, sub = jax.random.split(k)
        st, m = scanned_train_steps(
            st, device_images, device_labels, idx_chunk, sub,
            model_type="etinynet", model_cfg=cfg, optimizer=optimizer,
            strength=strength, augment=augment,
        )
        return st, k, m

    idx0 = jnp.asarray(rng.integers(0, n_data, (spd, batch)))
    for _ in range(2):
        state, key, metrics = dispatch(state, key, idx0)
    np.asarray(metrics["loss"])

    chunks = [jnp.asarray(rng.integers(0, n_data, (spd, batch)))
              for _ in range(dispatches)]
    t0 = time.perf_counter()
    for c in chunks:
        state, key, metrics = dispatch(state, key, c)
    loss = float(np.asarray(metrics["loss"])[-1])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    ips = dispatches * spd * batch / dt
    ms = dt / (dispatches * spd) * 1000.0
    label = strength if augment else "no-aug"
    print(f"etinynet 0.98M b{batch} {label:8s} {ms:7.3f} ms/step "
          f"{ips:10.0f} img/s")
    return ips


def main():
    import sys as _sys

    spds = [int(s) for s in _sys.argv[1:]] or [16]
    np.asarray(jnp.zeros(()))
    for spd in spds:
        print(f"steps_per_dispatch={spd}")
        measure("heavy", False, spd=spd)
        measure("light", True, spd=spd)
        measure("medium", True, spd=spd)
        measure("heavy", True, spd=spd)


if __name__ == "__main__":
    main()
