"""Object-style model facade over the functional core.

The functional modules (nnue.py / etinynet.py) are the TPU-native truth:
pure init/apply over pytrees. This facade packages (config, params, state)
into familiar model objects with the upstream's ergonomics (`model =
NNUE(feature_set=..., l1_size=...)`, `model(images)`,
`model.count_parameters()`, nnue.py:447-526 upstream) so reference users
and the benchmarks package have a drop-in surface. All compute still goes
through the jitted functional paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from nnue_vision_tpu.models import etinynet as _etiny
from nnue_vision_tpu.models import nnue as _nnue
from nnue_vision_tpu.models.etinynet import ETINYNET_VARIANTS, EtinyNetConfig
from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig


class NNUE:
    """NNUE model object: config + params, callable on NHWC image batches."""

    def __init__(
        self,
        feature_set: Optional[GridFeatureSet] = None,
        l1_size: int = _nnue.DEFAULT_L1,
        l2_size: int = _nnue.DEFAULT_L2,
        l3_size: int = _nnue.DEFAULT_L3,
        num_classes: int = 1,
        input_size: int = 32,
        weight_decay: float = 5e-4,
        seed: int = 0,
        params=None,
    ):
        if feature_set is None:
            feature_set = GridFeatureSet(10, 8)
        self.cfg = NNUEConfig(
            feature_set=feature_set,
            l1_size=l1_size,
            l2_size=l2_size,
            l3_size=l3_size,
            num_classes=num_classes,
            input_size=input_size,
        )
        self.weight_decay = weight_decay
        self.params = (
            params if params is not None
            else _nnue.nnue_init(jax.random.PRNGKey(seed), self.cfg)
        )

    # -- upstream-style attributes
    @property
    def feature_set(self) -> GridFeatureSet:
        return self.cfg.feature_set

    @property
    def l1_size(self) -> int:
        return self.cfg.l1_size

    @property
    def l2_size(self) -> int:
        return self.cfg.l2_size

    @property
    def l3_size(self) -> int:
        return self.cfg.l3_size

    @property
    def num_classes(self) -> int:
        return self.cfg.num_classes

    @property
    def input_size(self) -> int:
        return self.cfg.input_size

    @property
    def visual_threshold(self) -> np.ndarray:
        return np.asarray(self.params["visual_threshold"])

    def set_visual_threshold(self, value: float) -> None:
        self.params = dict(self.params)
        self.params["visual_threshold"] = (
            np.full_like(np.asarray(self.params["visual_threshold"]), value)
        )

    def __call__(self, images, return_aux: bool = False):
        return _nnue.nnue_apply(self.params, images, self.cfg, return_aux=return_aux)

    def count_parameters(self) -> int:
        return _nnue.count_parameters(self.params)

    def quantize(self):
        return _nnue.nnue_quantize(self.params, self.cfg)

    def get_quantized_model_data(self) -> dict:
        """Upstream-shaped quantized dict (nnue.py:541-588)."""
        q = self.quantize()
        return {
            "metadata": {
                "feature_set": self.feature_set,
                "L1": q.l1, "L2": q.l2, "L3": q.l3,
                "num_classes": q.num_classes,
                "nnue2score": q.nnue2score,
                "quantized_one": q.quantized_one,
                "visual_threshold": q.visual_threshold,
            },
            "conv_layer": {"weight": q.conv.weight, "bias": q.conv.bias,
                           "scale": q.conv.scale},
            "feature_transformer": {"weight": q.ft.weight, "bias": q.ft.bias,
                                    "scale": q.ft.scale},
            "classifier": {
                "layers": [
                    {"weight": lay.weight, "bias": lay.bias, "scale": lay.scale}
                    for lay in (q.fc1, q.fc2, q.out)
                ]
            },
        }


class EtinyNet:
    """EtinyNet model object (variant tables per upstream nnue.py:199-296)."""

    def __init__(
        self,
        variant: str = "1.0",
        num_classes: int = 1000,
        input_size: int = 112,
        weight_decay: float = 1e-4,
        use_asq: bool = False,
        asq_bits: int = 4,
        seed: int = 0,
        params=None,
        batch_stats=None,
    ):
        self.cfg = EtinyNetConfig(
            variant=variant,
            num_classes=num_classes,
            input_size=input_size,
            use_asq=use_asq,
            asq_bits=asq_bits,
        )
        self.weight_decay = weight_decay
        if params is None:
            params, batch_stats = _etiny.etinynet_init(
                jax.random.PRNGKey(seed), self.cfg
            )
        self.params = params
        self.batch_stats = batch_stats

    @property
    def variant(self) -> str:
        return self.cfg.variant

    @property
    def num_classes(self) -> int:
        return self.cfg.num_classes

    @property
    def input_size(self) -> int:
        return self.cfg.input_size

    @property
    def use_asq(self) -> bool:
        return self.cfg.use_asq

    @property
    def final_channels(self) -> int:
        return self.cfg.table["final_channels"]

    @property
    def configs(self) -> dict:
        return dict(self.cfg.table)

    def __call__(self, images, train: bool = False):
        logits, new_stats = _etiny.etinynet_apply(
            self.params, self.batch_stats, images, self.cfg, train=train
        )
        if train:
            self.batch_stats = new_stats
        return logits

    def count_parameters(self) -> int:
        return _etiny.count_parameters(self.params)

    def count_flops(self) -> int:
        """Approximate multiply-adds for one forward pass (the upstream CLI
        calls a nonexistent count_flops — serialize.py:904 upstream — this
        implements it)."""
        from benchmarks.mcu_simulation import count_mac_operations

        return count_mac_operations(self)["total"]

    def quantize(self):
        return _etiny.etinynet_quantize(self.params, self.batch_stats, self.cfg)
