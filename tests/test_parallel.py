"""Mesh / data-parallel tests on 8 virtual CPU devices (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
from nnue_vision_tpu.parallel.mesh import (
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)
from nnue_vision_tpu.training.optim import create_optimizer
from nnue_vision_tpu.training.step import make_train_state, train_step

CFG = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                 l3_size=4, num_classes=3, input_size=16)


class OptCfg:
    learning_rate = 0.05
    weight_decay = 0.0
    momentum = 0.9
    optimizer_type = "sgd"
    max_grad_norm = 1.0
    use_cosine_scheduler = False
    max_epochs = 1
    decay_lr = False
    use_cyclical_lr = False


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_mesh_and_sharding(rng):
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    batch = (
        rng.random((16, 4, 4, 3), dtype=np.float32).astype(np.float32),
        rng.integers(0, 3, 16).astype(np.int64),
    )
    images, labels = shard_batch(mesh, batch)
    assert images.sharding.spec == jax.sharding.PartitionSpec("data")
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in images.addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}

    params = replicate(mesh, nnue_init(jax.random.PRNGKey(0), CFG))
    assert params["ft_w"].sharding.spec == jax.sharding.PartitionSpec()


def test_pad_batch_to_devices(rng):
    batch = (np.ones((13, 2, 2, 3), np.float32), np.zeros(13, np.int64))
    images, labels = pad_batch_to_devices(batch, 8)
    assert images.shape[0] == 16 and labels.shape[0] == 16
    assert np.all(images[13:] == 0)


def test_sharded_step_matches_single_device(rng):
    """The data-parallel train step must produce the same loss and updated
    params as the unsharded step — GSPMD's psum is exact here because the
    per-example grads are averaged identically."""
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=1)
    params = nnue_init(jax.random.PRNGKey(0), CFG)
    images = rng.random((16, 16, 16, 3), dtype=np.float32).astype(np.float32)
    labels = rng.integers(0, 3, 16).astype(np.int64)

    # single device (default placement)
    state1 = make_train_state(params, optimizer)
    state1, m1 = train_step(state1, jnp.asarray(images), jnp.asarray(labels),
                            model_type="nnue", model_cfg=CFG,
                            optimizer=optimizer)

    # 8-device mesh
    mesh = make_mesh(8)
    state8 = replicate(mesh, make_train_state(params, optimizer))
    sharded = shard_batch(mesh, (images, labels))
    state8, m8 = train_step(state8, sharded[0], sharded[1],
                            model_type="nnue", model_cfg=CFG,
                            optimizer=optimizer)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(state1.params["fc1_w"]), np.asarray(state8.params["fc1_w"]),
        rtol=1e-5, atol=1e-7,
    )


def test_mesh_too_many_devices_rejected():
    with pytest.raises(ValueError):
        make_mesh(1024)


def test_sharded_int8_inference_matches_single_device(rng):
    """Serving at scale: the bit-exact int8 sim shards over the data mesh
    and produces identical logits to the single-device run."""
    from nnue_vision_tpu.ops.engine_sim import (
        nnue_engine_forward,
        nnue_sim_params,
    )
    from tests.conftest import random_quantized_nnue

    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    images = rng.random((16, 12, 12, 3), dtype=np.float32).astype(np.float32)

    ref_logits, _, ref_count = nnue_engine_forward(
        params, jnp.asarray(images), cfg=cfg, image_h=12, image_w=12
    )

    mesh = make_mesh(8)
    sharded_images = shard_batch(mesh, images)
    sharded_params = replicate(mesh, params)
    logits, _, count = nnue_engine_forward(
        sharded_params, sharded_images, cfg=cfg, image_h=12, image_w=12
    )
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))
