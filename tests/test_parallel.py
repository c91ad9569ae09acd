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


def test_scanned_sharded_pipeline_matches_single_device(rng):
    """The device-resident fast pipeline under a data mesh (dataset
    replicated, (K,B) index arrays sharded over the data axis) must produce
    the same per-step losses and final params as the single-device scanned
    path — this is the production multi-chip input pipeline
    (training/loop.py un-gated in round 2, VERDICT r1 item 3)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnue_vision_tpu.training.step import scanned_train_steps

    optimizer = create_optimizer(OptCfg(), steps_per_epoch=4)
    params = nnue_init(jax.random.PRNGKey(0), CFG)
    n_data, k_steps, batch = 64, 4, 16
    images = rng.random((n_data, 16, 16, 3), dtype=np.float32)
    labels = rng.integers(0, 3, n_data).astype(np.int64)
    idx = rng.integers(0, n_data, (k_steps, batch))
    key = jax.random.PRNGKey(7)

    # single device
    state1 = make_train_state(params, optimizer)
    state1, m1 = scanned_train_steps(
        state1, jnp.asarray(images), jnp.asarray(labels), jnp.asarray(idx),
        key, model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        strength="light", augment=False,
    )

    # 8-device mesh: replicated data, sharded indices
    mesh = make_mesh(8)
    state8 = replicate(mesh, make_train_state(params, optimizer))
    dev_images, dev_labels = replicate(mesh, (images, labels))
    idx_sharded = jax.device_put(idx, NamedSharding(mesh, P(None, "data")))
    state8, m8 = scanned_train_steps(
        state8, dev_images, dev_labels, idx_sharded, key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        strength="light", augment=False,
    )

    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state1.params["fc1_w"]), np.asarray(state8.params["fc1_w"]),
        rtol=1e-5, atol=1e-7,
    )


def test_train_model_uses_fast_pipeline_on_mesh(tmp_path, monkeypatch):
    """End-to-end: train_model on 8 virtual devices takes the device-resident
    scanned path (not the per-step host-feed fallback) and finishes green."""
    import nnue_vision_tpu.training.loop as loop_mod

    calls = {"scanned": 0}
    real_scanned = loop_mod.scanned_train_steps

    def counting_scanned(*a, **kw):
        calls["scanned"] += 1
        return real_scanned(*a, **kw)

    monkeypatch.setattr(loop_mod, "scanned_train_steps", counting_scanned)
    monkeypatch.setenv("NV_SKIP_ENGINE", "1")

    class Cfg:
        name = "mesh-fast-pipeline-test"
        project_name = "test"
        dataset_name = "synthetic"
        batch_size = 16
        num_workers = 0
        max_epochs = 1
        synthetic_size = 64
        grid_size = 4
        num_features_per_square = 4
        l1_size = 16
        l2_size = 8
        l3_size = 4
        num_classes = 10  # synthetic dataset emits 10 classes
        input_size = 32   # ... of 32×32 images
        learning_rate = 0.005
        weight_decay = 0.0
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = False
        decay_lr = False
        use_cyclical_lr = False
        use_augmentation = False
        augmentation_strength = "light"
        steps_per_dispatch = 2
        keep_alive = True
        log_dir = str(tmp_path)
        seed = 0

    assert loop_mod.train_model(Cfg(), "nnue") == 0
    assert calls["scanned"] > 0, (
        "multi-device training fell back to the slow host-feed path"
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


def test_sharded_pallas_inference_matches_single_device(rng):
    """The Pallas fused path can't be auto-partitioned by GSPMD (it is a
    custom call); shard_map runs the whole kernel per-shard over the data
    axis — serving scale-out for the fastest inference path. Must stay
    bit-identical to the single-device run."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnue_vision_tpu.ops.engine_sim import nnue_sim_params
    from nnue_vision_tpu.ops.pallas_kernels import (
        nnue_engine_forward_fused,
        pallas_head_params,
    )
    from tests.conftest import random_quantized_nnue

    q = random_quantized_nnue(rng, grid=4, ch=4, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    head = pallas_head_params(params)
    images = rng.random((16, 12, 12, 3), dtype=np.float32).astype(np.float32)

    fwd = partial(nnue_engine_forward_fused, cfg=cfg, image_h=12, image_w=12,
                  interpret=True)
    ref_logits, _, ref_count = fwd(params, head, jnp.asarray(images))

    mesh = make_mesh(8)
    sharded_images = shard_batch(mesh, images)
    rep_params = replicate(mesh, params)
    rep_head = replicate(mesh, head)
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so shard_map's vma checker cannot validate it
    sharded_fwd = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    logits, _, count = sharded_fwd(rep_params, rep_head, sharded_images)
    assert logits.sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(ref_count))


def test_fused_pipeline_sharded_matches_unfused(rng):
    """The fused Pallas input pipeline under the data mesh (VERDICT r4
    item 3): with identity augmentation the fused dp step must produce
    the SAME losses/params as the unfused dp step (augment=False), and
    with real augmentation the fused dp step must match the fused
    single-device step (the parameter draws happen outside shard_map,
    so only the gather kernel's partitioning differs)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnue_vision_tpu.ops.input_pipeline import prepare_gather_dataset
    from nnue_vision_tpu.training.step import (
        scanned_train_steps,
        scanned_train_steps_fused,
    )

    optimizer = create_optimizer(OptCfg(), steps_per_epoch=4)
    params = nnue_init(jax.random.PRNGKey(0), CFG)
    n_data, k_steps, batch = 64, 3, 16
    images = rng.random((n_data, 16, 16, 3), dtype=np.float32)
    labels = rng.integers(0, 3, n_data).astype(np.int64)
    idx = rng.integers(0, n_data, (k_steps, batch))
    key = jax.random.PRNGKey(9)
    mesh = make_mesh(8)
    gather = prepare_gather_dataset(jnp.asarray(images))
    idx_sharded = jax.device_put(idx, NamedSharding(mesh, P(None, "data")))

    # -- identity augmentation: fused dp == unfused dp, loss-for-loss --- #
    state_u = replicate(mesh, make_train_state(params, optimizer))
    dev_images, dev_labels = replicate(mesh, (images, labels))
    state_u, m_u = scanned_train_steps(
        state_u, dev_images, dev_labels, idx_sharded, key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        strength="light", augment=False,
    )
    state_f = replicate(mesh, make_train_state(params, optimizer))
    state_f, m_f = scanned_train_steps_fused(
        state_f, replicate(mesh, gather), dev_labels, idx_sharded, key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        height=16, width=16, interpret=True, mesh=mesh,
        identity_augment=True,
    )
    np.testing.assert_allclose(
        np.asarray(m_u["loss"]), np.asarray(m_f["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state_u.params["fc1_w"]),
        np.asarray(state_f.params["fc1_w"]), rtol=1e-5, atol=1e-7,
    )

    # -- real augmentation: fused dp == fused single-device ------------- #
    state_1 = make_train_state(params, optimizer)
    state_1, m_1 = scanned_train_steps_fused(
        state_1, gather, jnp.asarray(labels), jnp.asarray(idx), key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        height=16, width=16, interpret=True,
    )
    state_8 = replicate(mesh, make_train_state(params, optimizer))
    state_8, m_8 = scanned_train_steps_fused(
        state_8, replicate(mesh, gather), dev_labels, idx_sharded, key,
        model_type="nnue", model_cfg=CFG, optimizer=optimizer,
        height=16, width=16, interpret=True, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(m_1["loss"]), np.asarray(m_8["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_1.params["fc1_w"]),
        np.asarray(state_8.params["fc1_w"]), rtol=1e-5, atol=1e-7,
    )


def test_train_model_fused_pipeline_on_mesh(tmp_path, monkeypatch):
    """End-to-end: train_model with light augmentation on the 8-device mesh
    takes the FUSED Pallas input path (the mesh gate was dropped in round
    5, VERDICT r4 item 3) and finishes green."""
    import nnue_vision_tpu.training.loop as loop_mod

    calls = {"fused": 0}
    real_fused = loop_mod.scanned_train_steps_fused

    def counting_fused(*a, **kw):
        calls["fused"] += 1
        assert kw.get("mesh") is not None, "mesh not plumbed to fused step"
        return real_fused(*a, **kw)

    monkeypatch.setattr(
        loop_mod, "scanned_train_steps_fused", counting_fused)
    monkeypatch.setenv("NV_SKIP_ENGINE", "1")

    class Cfg:
        name = "mesh-fused-pipeline-test"
        project_name = "test"
        dataset_name = "synthetic"
        batch_size = 16
        num_workers = 0
        max_epochs = 1
        synthetic_size = 64
        grid_size = 4
        num_features_per_square = 4
        l1_size = 16
        l2_size = 8
        l3_size = 4
        num_classes = 10
        input_size = 32
        learning_rate = 0.005
        weight_decay = 0.0
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = False
        decay_lr = False
        use_cyclical_lr = False
        use_augmentation = True
        augmentation_strength = "light"
        steps_per_dispatch = 2
        keep_alive = True
        log_dir = str(tmp_path)
        seed = 0

    assert loop_mod.train_model(Cfg(), "nnue") == 0
    assert calls["fused"] > 0, (
        "mesh training fell back to the unfused input path"
    )


def test_train_model_epoch_metrics_match_single_device(tmp_path, monkeypatch):
    """One epoch of the REAL loop (per-epoch float eval + compiled int8-sim
    eval both on) on the 8-device mesh must report the same epoch metrics
    as the single-device run (VERDICT r4 item 6 — nothing previously
    exercised compiled eval inside train_model under a mesh). Augmentation
    off so both runs are deterministic given the seed."""
    import json

    import nnue_vision_tpu.training.loop as loop_mod

    monkeypatch.setenv("NV_SKIP_ENGINE", "1")

    def make_cfg(log_dir, max_devices):
        class Cfg:
            name = f"mesh-eval-epoch-{max_devices}"
            project_name = "test"
            dataset_name = "synthetic"
            batch_size = 16
            num_workers = 0
            max_epochs = 1
            synthetic_size = 64
            grid_size = 4
            num_features_per_square = 4
            l1_size = 16
            l2_size = 8
            l3_size = 4
            num_classes = 10
            input_size = 32
            learning_rate = 0.005
            weight_decay = 0.0
            momentum = 0.9
            optimizer_type = "sgd"
            max_grad_norm = 1.0
            use_cosine_scheduler = False
            decay_lr = False
            use_cyclical_lr = False
            use_augmentation = False
            augmentation_strength = "light"
            steps_per_dispatch = 2
            compiled_backend = "sim"
            keep_alive = True
            seed = 0

        Cfg.log_dir = str(log_dir)
        Cfg.max_devices = max_devices
        return Cfg()

    def epoch_metrics(log_dir):
        (metrics_file,) = list(
            (log_dir / "runs").rglob("metrics.jsonl"))
        recs = [json.loads(l) for l in metrics_file.read_text().splitlines()]
        out = {}
        for r in recs:
            for k, v in r.items():
                if any(k.startswith(p) for p in
                       ("val/", "compiled/", "test/")):
                    out[k] = v
        assert any(k.startswith("compiled/") for k in out), (
            "compiled eval did not run"
        )
        return out

    d1 = tmp_path / "single"
    assert loop_mod.train_model(make_cfg(d1, 1), "nnue") == 0
    m1 = epoch_metrics(d1)

    d8 = tmp_path / "mesh"
    assert loop_mod.train_model(make_cfg(d8, 8), "nnue") == 0
    m8 = epoch_metrics(d8)

    assert set(m1) == set(m8)
    for k in m1:
        if k.endswith("ms_per_sample"):
            continue  # wall-clock, not a model metric
        np.testing.assert_allclose(
            m1[k], m8[k], rtol=1e-4, atol=1e-6,
            err_msg=f"epoch metric {k} diverged between mesh and single",
        )
