"""TPU compute ops: bit-exact int8 engine simulation and Pallas kernels."""

from nnue_vision_tpu.ops.engine_sim import (  # noqa: F401
    engine_conv_stride,
    etiny_engine_forward,
    etiny_sim_params,
    nnue_engine_forward,
    nnue_sim_params,
)
