"""Mesh construction + sharding helpers.

The reference has no multi-device support at all (SURVEY.md §2.15: single
`model.to(device)`). Here scale-out is native: a 1-D `Mesh` over all chips
with a `data` axis; batches are sharded along it, params replicated, and
GSPMD inserts the gradient `psum` over ICI when the jitted train step runs.
The axis layout is written so extra axes (e.g. a `model` axis for tensor
parallelism) can be appended without touching call sites — helpers accept
an `axes` tuple.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, axes: Tuple[str, ...] = (DATA_AXIS,)
) -> Mesh:
    """1-D (or reshaped n-D) mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    shape = (len(devices),) if len(axes) == 1 else None
    if shape is None:
        # Fill trailing axes with 1 so a single mesh literal supports
        # future tp/pp axes without reshaping call sites.
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(np.array(devices).reshape(shape), axes)


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place array leaves with the leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, opt state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


MODEL_AXIS = "model"


def nnue_param_shardings(mesh: Mesh, params):
    """NamedShardings for tensor-parallel NNUE params over a `model` axis.

    The feature transformer dominates the parameter count; its output (L1)
    dimension shards cleanly: each model-shard computes its slice of the
    FT accumulator, and GSPMD inserts the all-gather before the pairwise
    interaction (which mixes the two L1 halves). fc1's input dimension
    shards to match. Everything else is small and stays replicated.
    """
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{MODEL_AXIS}' axis: {mesh.axis_names}")
    plan = {
        "ft_w": P(None, MODEL_AXIS),   # (F, L1) sharded over L1
        "ft_b": P(MODEL_AXIS),         # (L1,)
        "fc1_w": P(None, MODEL_AXIS),  # (L2, L1) sharded over input dim
    }
    return {
        name: NamedSharding(mesh, plan.get(name, P()))
        for name in params
    }


def shard_params(mesh: Mesh, params, shardings=None):
    """Place params per the sharding plan (replicated where unspecified)."""
    if shardings is None:
        shardings = nnue_param_shardings(mesh, params)
    return {
        name: jax.device_put(value, shardings[name])
        for name, value in params.items()
    }


def pad_batch_to_devices(batch, n_devices: int):
    """Zero-pad the leading dim so it divides the data axis (host helper)."""
    def pad(x):
        b = x.shape[0]
        rem = (-b) % n_devices
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    return jax.tree_util.tree_map(pad, batch)
