"""Device-mesh parallelism: data-parallel sharding over ICI."""

from nnue_vision_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
