"""TPU incremental accumulator: update == refresh == full forward,
and agreement with the C++ engine's incremental path semantics."""

import numpy as np
import jax.numpy as jnp

from nnue_vision_tpu.ops.engine_sim import (
    nnue_accumulator_refresh,
    nnue_accumulator_update,
    nnue_engine_forward,
    nnue_feature_mask,
    nnue_head_from_accumulator,
    nnue_sim_params,
)
from tests.conftest import random_quantized_nnue


def test_incremental_equals_refresh(rng):
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    f = q.num_features
    m0 = (rng.random((3, f)) < 0.3).astype(np.float32)
    acc = nnue_accumulator_refresh(params, jnp.asarray(m0))

    masks = m0
    for _ in range(4):  # a stream of frames with random feature flips
        flips = (rng.random((3, f)) < 0.05)
        new_masks = np.where(flips, 1.0 - masks, masks).astype(np.float32)
        acc = nnue_accumulator_update(
            params, acc, jnp.asarray(new_masks), jnp.asarray(masks)
        )
        masks = new_masks

    full = nnue_accumulator_refresh(params, jnp.asarray(masks))
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(full))

    # head from either accumulator gives identical logits
    l_inc = nnue_head_from_accumulator(params, acc, cfg=cfg)
    l_ref = nnue_head_from_accumulator(params, full, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(l_inc), np.asarray(l_ref))


def test_mask_head_composition_equals_forward(rng):
    """feature_mask → refresh → head == the monolithic engine forward."""
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4,
                              num_classes=3)
    params, cfg = nnue_sim_params(q)
    h = 12
    imgs = (rng.random((4, h, h, 3), dtype=np.float32) * 2 - 0.5).astype(
        np.float32
    )
    ref_logits, _, ref_count = nnue_engine_forward(
        params, imgs, cfg=cfg, image_h=h, image_w=h
    )
    mask = nnue_feature_mask(params, imgs, cfg=cfg, image_h=h, image_w=h)
    np.testing.assert_array_equal(
        np.asarray(mask).sum(axis=1).astype(np.int32), np.asarray(ref_count)
    )
    acc = nnue_accumulator_refresh(params, mask)
    logits = nnue_head_from_accumulator(params, acc, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))
