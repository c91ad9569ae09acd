#!/usr/bin/env python3
"""Roofline of the EtinyNet-0.98M no-aug train step (VERDICT r4 item 1:
"the 363k no-aug step itself deserves the same floor analysis — what's
its dispatch share?").

Decomposes the batch-1024 no-aug step (measured ~2.2 ms round 5) into:
  - the scan-machinery floor (gather + a trivial param update, no model)
  - forward only
  - forward + backward (no optimizer)
  - the full step (fwd + bwd + BN stats + SGD + clip)
and prints the f32 activation-traffic bound for comparison — the
EtinyNet step is expected to be HBM/launch-bound, not MXU-bound: its
convs are small (≤ 32×32 spatial, ≤ 192 channels) so each XLA kernel
moves activations at low arithmetic intensity.

Timing contract: K scan-chained steps per dispatch, carry-threaded,
readback-forced, best of 3.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.models.etinynet import (
    EtinyNetConfig,
    etinynet_apply,
    etinynet_init,
)
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


B, K = 1024, 16


def timed(name, run, *args, reps=3):
    np.asarray(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1000.0
    print(f"{name:42s} {ms:8.3f} ms/step  {B / (ms / 1000.0):10.0f} img/s")
    return ms


def main():
    np.asarray(jnp.zeros(()))
    rng = np.random.default_rng(0)
    n_data = 8192
    images = jnp.asarray(rng.random((n_data, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 10, n_data).astype(np.int64))
    cfg = EtinyNetConfig(variant="0.98M", num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(3), cfg)
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=97)
    state = make_train_state(params, optimizer, stats)
    idx = jnp.asarray(rng.integers(0, n_data, (K, B)))
    key = jax.random.PRNGKey(4)

    # 1. scan-machinery floor: gather + a trivial data-dependent update
    @jax.jit
    def floor(w, idx):
        def body(carry, i):
            x = jnp.take(images, i, axis=0)
            return carry + x.mean() * 1e-9, ()
        out, _ = jax.lax.scan(body, w, idx)
        return out
    timed("scan floor (gather + scalar update)", floor, jnp.float32(0.0), idx)

    # 2. forward only (train-mode BN, stats discarded)
    @jax.jit
    def fwd_only(params, stats, idx):
        def body(carry, i):
            p, s = carry
            x = jnp.take(images, i, axis=0)
            logits, s2 = etinynet_apply(p, s, x, cfg, train=True)
            return (jax.tree_util.tree_map(
                lambda a: a + logits.mean() * 1e-12, p), s2), ()
        out, _ = jax.lax.scan(body, (params, stats), idx)
        return out[0]["stem_w"][0, 0, 0, 0]
    timed("forward only (+BN stats)", fwd_only, params, stats, idx)

    # 3. forward + backward, no optimizer
    @jax.jit
    def fwd_bwd(params, stats, idx):
        def loss_fn(p, s, x, y):
            logits, s2 = etinynet_apply(p, s, x, cfg, train=True)
            one = jax.nn.one_hot(y, 10)
            return -(one * jax.nn.log_softmax(logits)).sum(-1).mean(), s2

        def body(carry, i):
            p, s = carry
            x = jnp.take(images, i, axis=0)
            y = jnp.take(labels, i, axis=0)
            (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, x, y)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
            return (p, s2), ()
        out, _ = jax.lax.scan(body, (params, stats), idx)
        return out[0]["stem_w"][0, 0, 0, 0]
    timed("forward + backward (sgd-free)", fwd_bwd, params, stats, idx)

    # 4. the production step (scanned_train_steps, augment off)
    def full(state, idx):
        st, m = scanned_train_steps(
            state, images, labels, idx, key, model_type="etinynet",
            model_cfg=cfg, optimizer=optimizer, strength="heavy",
            augment=False,
        )
        return m["loss"][-1]
    timed("full step (fwd+bwd+BN+SGD+clip)", full, state, idx)

    # activation-traffic bound: sum of f32 activation bytes per layer
    # (read+write ≈ 2×), fwd+bwd ≈ 3× forward traffic
    shapes = [(32, 28), (32, 28), (16, 96), (16, 96), (8, 168), (8, 168),
              (4, 192), (4, 192), (4, 384), (4, 384), (1, 384)]
    fwd_bytes = sum(B * h * h * c * 4 * 2 for h, c in shapes)
    hbm = 820e9  # v5e ~819 GB/s
    bound_ms = 3 * fwd_bytes / hbm * 1000
    print(f"\nf32 activation-traffic bound (3x fwd, ~{fwd_bytes/1e6:.0f} MB "
          f"fwd): {bound_ms:.3f} ms/step "
          f"({B / (bound_ms / 1000.0):.0f} img/s)")


if __name__ == "__main__":
    main()
