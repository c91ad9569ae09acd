"""nnue_vision_tpu — a TPU-native (JAX/XLA/Pallas) vision framework.

Re-implements the full capability surface of the reference NNUE-Vision
pipeline (train → quantize → serialize → int8 inference) as a new,
TPU-first design:

* Models (`models/`): NNUE (sparse grid features + feature-transformer) and
  EtinyNet (LB/DLB tinyML CNN) as pure-functional JAX modules.
* Ops (`ops/`): bit-exact int8 engine simulation that reproduces the C++
  inference engine's integer arithmetic in-graph (vmapped, jitted), plus
  Pallas kernels for the hot paths.
* Parallel (`parallel/`): mesh construction and sharded train steps
  (pjit / shard_map over a data axis; designed so TP axes can be added).
* Serialization (`formats.py` / `quantize.py`): byte-exact `.nnue` v2 and
  `.etiny` v1 writers/readers interchangeable with the reference C++ engine
  (reference format spec: serialize.py:30-497, engine/src/nnue_engine.cpp
  readers).
* Training (`training/`), data pipeline (`data/`), cloud launcher (`cloud/`).
"""

__version__ = "0.1.0"

from nnue_vision_tpu.formats import (  # noqa: F401
    NNUE_MAGIC,
    ETINY_MAGIC,
    read_etiny,
    read_nnue,
    write_etiny,
    write_nnue,
)
