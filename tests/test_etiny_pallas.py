"""Fused EtinyNet Pallas block kernel vs the XLA engine sim (which is
itself verified bit-exact against the C++ `etinynet_inference` binary).
Runs in interpreter mode on CPU; the TPU-compiled path is exercised by
bench.py's bit-exactness assertion on real hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnue_vision_tpu.formats import QConv, QLBBlock, QLinear, QuantizedEtinyNet
from nnue_vision_tpu.ops.engine_sim import etiny_engine_forward, etiny_sim_params
from nnue_vision_tpu.ops.etiny_pallas import (
    etiny_forward_pallas,
    etiny_pallas_params,
)


def _random_etiny(rng, *, dense_stride2=False, num_classes=10):
    """Micro-scale quantized model: stride-2 LB, stride-1 LB, stride-1
    dense (quirk-free, as our serializer emits); optionally a stride-2
    dense block to exercise the kernel path's rejection."""

    def i8(*s):
        return rng.integers(-127, 128, s).astype(np.int8)

    blocks = [
        QLBBlock(pw_expand=i8(16, 8), dw=i8(16, 3, 3), pw_project=i8(16, 16),
                 stride=2),
        QLBBlock(pw_expand=i8(24, 16), dw=i8(24, 3, 3), pw_project=i8(24, 24),
                 stride=2 if dense_stride2 else 1, is_dense=dense_stride2),
        QLBBlock(pw_expand=i8(24, 24), dw=i8(24, 3, 3), pw_project=i8(24, 24),
                 stride=1, is_dense=True),
    ]
    return QuantizedEtinyNet(
        variant="micro", num_classes=num_classes, input_size=32,
        conv_channels=8, final_channels=24,
        stem=QConv(weight=i8(8, 3, 3, 3),
                   bias=rng.integers(-500, 500, 8).astype(np.int32)),
        blocks=blocks,
        classifier=QLinear(
            weight=i8(num_classes, 24),
            bias=rng.integers(-2000, 2000, num_classes).astype(np.int32),
        ),
    ).validate()


@pytest.mark.parametrize("batch", [1, 4, 9])
def test_pallas_blocks_match_engine_sim(rng, batch):
    q = _random_etiny(rng)
    sim_params, cfg = etiny_sim_params(q)
    pp = etiny_pallas_params(sim_params, cfg)
    imgs = jnp.asarray(
        rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)
    )
    ref = etiny_engine_forward(sim_params, imgs, cfg=cfg, image_h=32,
                               image_w=32)
    got = etiny_forward_pallas(pp, imgs, cfg=cfg, image_h=32, image_w=32,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_matches_real_serialized_model(rng):
    """End-to-end with a trained-shape model through the actual
    quantizer (amplifier final block, LSQ scales) rather than random
    int8 tensors."""
    from nnue_vision_tpu.models.etinynet import (
        EtinyNetConfig,
        etinynet_init,
        etinynet_quantize,
    )

    e_cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32)
    params, stats = etinynet_init(jax.random.PRNGKey(3), e_cfg)
    q = etinynet_quantize(params, stats, e_cfg)
    sim_params, cfg = etiny_sim_params(q)
    pp = etiny_pallas_params(sim_params, cfg)
    imgs = jnp.asarray(rng.standard_normal((5, 32, 32, 3)).astype(np.float32))
    ref = etiny_engine_forward(sim_params, imgs, cfg=cfg, image_h=32,
                               image_w=32)
    got = etiny_forward_pallas(pp, imgs, cfg=cfg, image_h=32, image_w=32,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stride2_dense_quirk_model_rejected(rng):
    """The engine's dim-scrambling quirk path (stride-2 dense block) is
    XLA-sim-only; the kernel path must refuse rather than mis-compute."""
    q = _random_etiny(rng, dense_stride2=True)
    sim_params, cfg = etiny_sim_params(q)
    with pytest.raises(ValueError, match="dense block"):
        etiny_pallas_params(sim_params, cfg)
