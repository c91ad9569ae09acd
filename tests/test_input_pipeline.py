"""Fused gather+augment+normalize Pallas kernel (ops/input_pipeline.py).

The kernel is the production NNUE input path (VERDICT r3 item 3); these
tests pin its math to within one FMA-contraction ulp against a pure-jnp
oracle fed IDENTICAL per-sample parameters (exactly, for samples the
brightness/contrast FMA does not touch), check the parameter draws match
the light tier's
distributions (data/augment.py:233-236), and prove the fused scan step
trains. Runs in Pallas interpret mode on the CPU test platform."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nnue_vision_tpu.ops.input_pipeline import (
    LightParams,
    draw_light_params,
    fused_light_pipeline,
    identity_light_params,
    light_pipeline_reference,
    prepare_gather_dataset,
)


def _images(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, h, w, 3), np.float32))


def _step_params(params, k):
    return LightParams(
        flip=params.flip[k], pf=params.pf[k], pi=params.pi[k]
    )


@pytest.mark.parametrize("h,w,batch,tile_b", [
    (32, 32, 16, 8),    # production shape (3072 = 24·128, no padding)
    (16, 16, 8, 8),     # 768 = 6·128
    (10, 10, 12, 5),    # 300 → padded row, odd tile
])
def test_fused_kernel_matches_reference_exactly(h, w, batch, tile_b):
    n = 24
    images = _images(n, h, w)
    ds = prepare_gather_dataset(images)
    assert ds.shape[0] == 2 * n

    key = jax.random.PRNGKey(7)
    params = draw_light_params(key, 3, batch, h, w)
    idx = jax.random.randint(jax.random.PRNGKey(8), (3, batch), 0, n)

    for k in range(3):
        p = _step_params(params, k)
        idx_eff = (idx[k] + n * p.flip.astype(jnp.int32)).astype(jnp.int32)
        got = fused_light_pipeline(
            ds, idx_eff, p.pf, p.pi, h=h, w=w, tile_b=tile_b, interpret=True
        )
        want = light_pipeline_reference(images, idx[k], p)
        # The jitted kernel contracts x·α+β into an FMA; the eager oracle
        # rounds the product first. Only brightness/contrast-applied
        # samples can differ, by ≤1 ulp of the normalized value.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=1e-6
        )
        bc_off = np.asarray(p.pf[:, 0]) == 1.0
        np.testing.assert_array_equal(
            np.asarray(got)[bc_off], np.asarray(want)[bc_off]
        )


def test_identity_params_equal_plain_normalize():
    from nnue_vision_tpu.data.augment import preprocess_batch

    n, h, w, batch = 20, 32, 32, 16
    images = _images(n, h, w, seed=3)
    ds = prepare_gather_dataset(images)
    idx = jax.random.randint(jax.random.PRNGKey(0), (batch,), 0, n)
    p = _step_params(identity_light_params(1, batch), 0)
    got = fused_light_pipeline(
        ds, idx.astype(jnp.int32), p.pf, p.pi, h=h, w=w, tile_b=8,
        interpret=True,
    )
    want = preprocess_batch(jax.random.PRNGKey(0), jnp.take(images, idx, 0),
                            augment=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_draw_distributions_match_light_tier():
    """Apply-rates and value ranges of the hoisted draws equal the XLA
    light tier's: flip p=.5, bc p=.2 (α∈[0.9,1.1]), cutout p=.2 with a
    max(1, ·) sized hole inside the frame."""
    h = w = 32
    params = draw_light_params(jax.random.PRNGKey(42), 64, 256, h, w)
    flip_rate = float(params.flip.mean())
    assert 0.47 < flip_rate < 0.53

    alpha = np.asarray(params.pf[..., 0])
    bc_rate = float((alpha != 1.0).mean())
    assert 0.17 < bc_rate < 0.23
    assert alpha.min() >= 0.9 - 1e-6 and alpha.max() <= 1.1 + 1e-6

    pi = np.asarray(params.pi)
    active = pi[..., 1] > pi[..., 0]
    cut_rate = float(active.mean())
    assert 0.17 < cut_rate < 0.23
    hh = pi[..., 1] - pi[..., 0]
    assert hh[active].min() >= 1 and pi[..., 1].max() <= h
    assert (pi[..., 0] >= 0).all() and (pi[..., 2] >= 0).all()
    # inactive rows encode the empty rectangle
    assert (pi[..., 1][~active] == 0).all()


def test_scanned_train_steps_fused_trains():
    """One fused dispatch on the NNUE flagship config (interpret mode):
    finite per-step metrics, advancing step counter, loss that moves."""
    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet,
        NNUEConfig,
        nnue_init,
    )
    from nnue_vision_tpu.training.step import (
        make_train_state,
        scanned_train_steps_fused,
    )

    n, h, w, batch, steps = 64, 32, 32, 16, 4
    images = _images(n, h, w, seed=11)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 10, n))
    ds = prepare_gather_dataset(images)

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(grid_size=4, num_features_per_square=4),
        l1_size=64, l2_size=8, l3_size=16, num_classes=10, input_size=32,
    )
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    optimizer = optax.sgd(0.05, momentum=0.9)
    state = make_train_state(params, optimizer)

    idx = jax.random.randint(jax.random.PRNGKey(5), (steps, batch), 0, n)
    new_state, metrics = scanned_train_steps_fused(
        state, ds, labels, idx, jax.random.PRNGKey(6),
        model_type="nnue", model_cfg=cfg, optimizer=optimizer,
        height=h, width=w, tile_b=8, interpret=True,
    )
    assert metrics["loss"].shape == (steps,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(new_state.step) == steps
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
