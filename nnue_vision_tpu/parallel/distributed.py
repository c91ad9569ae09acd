"""Multi-host (DCN) distributed initialization + per-host data feeding.

The reference's scale-out story is one cloud box per run
(nnue_runpod_service.py:112-206 upstream — rent a pod, train, stop it).
The TPU-native translation (SURVEY.md §2.15) is multi-process JAX over a
pod slice: every host runs the SAME program, `jax.distributed.initialize`
wires them into one runtime over DCN, and a global `Mesh` spans all chips
— data-parallel gradients ride ICI within a slice and DCN across hosts,
inserted by GSPMD; nothing here speaks NCCL/MPI.

Surface (mirrors `jax.distributed.initialize`, with env-var defaults so
the same train CLI works single-host, multi-host, and under test):

    from nnue_vision_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(coordinator="10.0.0.1:8476",
                           num_processes=4, process_id=host_idx)

Per-host input pipeline: each host loads/generates only its shard of the
batch; `host_batch_to_global` assembles the global sharded array without
any host ever materializing the full batch.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Wire this process into a multi-host JAX runtime (idempotent).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure hosts
    without touching the training command line. No-op when neither
    arguments nor env vars request distribution (single-host runs).

    On real TPU pods, `jax.distributed.initialize()` with no arguments
    auto-discovers everything from the TPU metadata — pass nothing and it
    does the right thing; explicit args are for CPU/GPU clusters + tests.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        return  # single-host

    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query initializes XLA and makes initialize() illegal.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # idempotent: tolerate double-init only
        # jax 0.9 raises "distributed.initialize should only be called
        # once."; older versions said "already initialized".
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def make_global_mesh(axes: Tuple[str, ...] = ("data",)) -> Mesh:
    """A mesh over ALL devices of ALL processes (1-D by default).

    For n-D layouts the data axis spans hosts (DCN-friendly: data-parallel
    gradient reduction tolerates DCN latency) while trailing model axes
    stay within a host's chips (ICI-bound collectives).
    """
    devices = np.array(jax.devices())
    if len(axes) > 1:
        per_host = max(1, len(devices) // jax.process_count())
        model = 1
        for cand in range(min(per_host, len(devices)), 0, -1):
            if len(devices) % cand == 0:
                model = cand
                break
        devices = devices.reshape((len(devices) // model, model))
        # trailing axes beyond 2 get size 1
        devices = devices.reshape(devices.shape + (1,) * (len(axes) - 2))
    return Mesh(devices, axes)


def host_batch_to_global(mesh: Mesh, batch, axis: str = "data"):
    """Assemble per-host local batches into one global sharded array.

    Every process passes ITS shard (leading dim = global_batch /
    process_count); the result is a global jax.Array sharded over `axis`
    whose addressable shards are exactly the local data — no host→host
    copies, no full-batch materialization anywhere.
    """
    sharding = NamedSharding(mesh, P(axis))

    def convert(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(convert, batch)


def process_local_slice(n: int, seed_stride: int = 0) -> Tuple[int, int]:
    """(start, stop) of this process's contiguous share of n samples.

    Deterministic equal split (last process absorbs the remainder);
    `seed_stride` is a convenience for shifting per-epoch shuffles.
    """
    del seed_stride
    per = n // jax.process_count()
    start = jax.process_index() * per
    stop = n if jax.process_index() == jax.process_count() - 1 else start + per
    return start, stop
