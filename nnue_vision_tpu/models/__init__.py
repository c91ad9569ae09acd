"""Model families: NNUE (sparse grid features) and EtinyNet (tinyML CNN)."""

from nnue_vision_tpu.models.nnue import (  # noqa: F401
    GridFeatureSet,
    NNUEConfig,
    binary_activation_ste,
    nnue_apply,
    nnue_init,
    nnue_quantize,
)
from nnue_vision_tpu.models.etinynet import (  # noqa: F401
    ETINYNET_VARIANTS,
    EtinyNetConfig,
    etinynet_apply,
    etinynet_init,
    etinynet_quantize,
)
