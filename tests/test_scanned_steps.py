"""scanned_train_steps (K steps per dispatch) must equal K sequential
gathered steps — the dispatch fusion is a pure performance transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
from nnue_vision_tpu.training.optim import create_optimizer
from nnue_vision_tpu.training.step import (
    gathered_train_step,
    make_train_state,
    scanned_train_steps,
)

CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                 l3_size=4, num_classes=3, input_size=16)


class OptCfg:
    learning_rate = 0.05
    weight_decay = 1e-4
    momentum = 0.9
    optimizer_type = "sgd"
    max_grad_norm = 1.0
    use_cosine_scheduler = False
    max_epochs = 1
    decay_lr = False
    use_cyclical_lr = False


def test_scan_equals_sequential(rng):
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=4)
    params = nnue_init(jax.random.PRNGKey(0), CFG)

    n = 64
    device_images = jnp.asarray(rng.random((n, 16, 16, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 3, n).astype(np.int64))
    k_steps, batch = 4, 8
    idx_chunk = jnp.asarray(rng.integers(0, n, (k_steps, batch)))
    key = jax.random.PRNGKey(7)

    # fused
    state_a = make_train_state(params, optimizer)
    state_a, metrics_a = scanned_train_steps(
        state_a, device_images, device_labels, idx_chunk, key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        strength="light", augment=True,
    )

    # sequential with the same per-step keys
    keys = jax.random.split(key, k_steps)
    state_b = make_train_state(params, optimizer)
    losses_b = []
    for i in range(k_steps):
        state_b, m = gathered_train_step(
            state_b, device_images, device_labels, idx_chunk[i], keys[i],
            model_type="nnue", model_cfg=CFG, optimizer=optimizer,
            strength="light", augment=True,
        )
        losses_b.append(float(m["loss"]))

    np.testing.assert_allclose(
        np.asarray(metrics_a["loss"]), np.asarray(losses_b), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_a.params["ft_w"]), np.asarray(state_b.params["ft_w"]),
        rtol=1e-5, atol=1e-7,
    )
    assert int(state_a.step) == k_steps


def test_scanned_steps_etinynet_bf16(rng):
    """The production EtinyNet mode (dtype="bfloat16",
    config/train_etinynet.py since round 5) must train through the
    scanned dispatch path: finite decreasing-ish loss, f32 master
    params, f32 running statistics, step count advanced."""
    from nnue_vision_tpu.models.etinynet import EtinyNetConfig, etinynet_init

    e_cfg = EtinyNetConfig(variant="micro", num_classes=3, input_size=16,
                           dtype="bfloat16")
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=4)
    params, stats = etinynet_init(jax.random.PRNGKey(0), e_cfg)
    state = make_train_state(params, optimizer, stats)

    n = 64
    device_images = jnp.asarray(rng.random((n, 16, 16, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 3, n).astype(np.int64))
    k_steps, batch = 3, 8
    idx_chunk = jnp.asarray(rng.integers(0, n, (k_steps, batch)))

    state, metrics = scanned_train_steps(
        state, device_images, device_labels, idx_chunk, jax.random.PRNGKey(7),
        model_type="etinynet", model_cfg=e_cfg, optimizer=optimizer,
        strength="heavy", augment=True,
    )
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (k_steps,) and np.all(np.isfinite(losses))
    assert int(state.step) == k_steps
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    assert state.batch_stats["stem_bn"]["mean"].dtype == jnp.float32
