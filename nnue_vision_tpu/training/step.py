"""The jitted train/eval steps for both model families.

Pure functions over a TrainState pytree; one `jax.jit` each, shardable
over a data mesh (params replicated, batch sharded — GSPMD inserts the
gradient psum). Loss is cross-entropy like the reference (train.py:250-254;
its LossParams dataclass is declared but unused there — kept in the model
config for capability parity).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from nnue_vision_tpu.models.etinynet import etinynet_apply
from nnue_vision_tpu.models.nnue import nnue_apply, nnue_clip_weights


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any  # None for NNUE
    step: jnp.ndarray


def make_train_state(params, optimizer, batch_stats=None) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        batch_stats=batch_stats,
        step=jnp.zeros((), jnp.int32),
    )


def _loss_and_logits(model_type, model_cfg, params, batch_stats, images, labels,
                     teacher=None):
    if model_type == "nnue":
        logits = nnue_apply(params, images, model_cfg)
        new_stats = batch_stats
    else:
        logits, new_stats = etinynet_apply(
            params, batch_stats, images, model_cfg, train=True
        )
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    if teacher is not None:
        # Knowledge distillation (Hinton et al. 2015): soften both
        # distributions at temperature T, cross-entropy against the frozen
        # teacher, gradient rescaled by T². Used by the format-ceiling
        # oracle: distill the unconstrained float model into the
        # engine_friendly (7-level-activation) student to measure what the
        # deployment format can actually carry.
        t_cfg, t_params, t_stats, alpha, temp = teacher
        if model_type == "nnue":
            t_logits = nnue_apply(t_params, images, t_cfg)
        else:
            t_logits, _ = etinynet_apply(
                t_params, t_stats, images, t_cfg, train=False
            )
        t_prob = jax.nn.softmax(jax.lax.stop_gradient(t_logits) / temp)
        kd = optax.softmax_cross_entropy(logits / temp, t_prob).mean()
        loss = alpha * loss + (1.0 - alpha) * (temp * temp) * kd
    return loss, (logits, new_stats)


@functools.partial(
    jax.jit, static_argnames=("model_type", "model_cfg", "optimizer", "clip_weights",
                              "teacher_cfg", "distill_alpha", "distill_temp")
)
def train_step(
    state: TrainState,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    model_type: str,
    model_cfg,
    optimizer: optax.GradientTransformation,
    clip_weights: bool = True,
    teacher_cfg=None,
    teacher_params=None,
    teacher_stats=None,
    distill_alpha: float = 0.5,
    distill_temp: float = 4.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. Returns (new_state, {"loss", "accuracy"})."""
    teacher = None
    if teacher_cfg is not None:
        teacher = (teacher_cfg, teacher_params, teacher_stats,
                   distill_alpha, distill_temp)
    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        _loss_and_logits, argnums=2, has_aux=True
    )(model_type, model_cfg, state.params, state.batch_stats, images, labels,
      teacher)

    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if model_type == "nnue" and clip_weights:
        # The reference clips FT/classifier weights to [-1,1] before every
        # serialization — which its train loop triggers every epoch via
        # compiled eval (evaluate.py:122-129 → nnue.py:528-539, mutating the
        # live model). We apply the clip each step: keeps training inside
        # the quantizable region instead of sawtooth-clipping once an epoch.
        new_params = nnue_clip_weights(new_params)

    acc = (logits.argmax(axis=-1) == labels).mean()
    return (
        TrainState(new_params, new_opt_state, new_stats, state.step + 1),
        {"loss": loss, "accuracy": acc},
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_type", "model_cfg", "optimizer", "clip_weights", "strength",
        "augment", "teacher_cfg", "distill_alpha", "distill_temp",
    ),
)
def scanned_train_steps(
    state: TrainState,
    device_images: jnp.ndarray,   # (N, H, W, 3) full dataset on device
    device_labels: jnp.ndarray,   # (N,)
    idx_chunk: jnp.ndarray,       # (K, B) indices for K consecutive steps
    key: jax.Array,
    *,
    model_type: str,
    model_cfg,
    optimizer: optax.GradientTransformation,
    strength: str = "medium",
    augment: bool = True,
    clip_weights: bool = True,
    teacher_cfg=None,
    teacher_params=None,
    teacher_stats=None,
    distill_alpha: float = 0.5,
    distill_temp: float = 4.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """K optimizer steps in ONE device dispatch via lax.scan.

    For models this small the per-step cost is dominated by host dispatch
    and kernel-launch overhead, not FLOPs; scanning K steps amortizes it.
    Returns per-step metric arrays of shape (K,).
    """
    from nnue_vision_tpu.data.augment import preprocess_batch

    keys = jax.random.split(key, idx_chunk.shape[0])

    def body(carry, inp):
        st = carry
        idx, k = inp
        images = jnp.take(device_images, idx, axis=0)
        labels = jnp.take(device_labels, idx, axis=0)
        x = preprocess_batch(k, images, strength=strength, augment=augment)
        st, metrics = train_step(
            st, x, labels,
            model_type=model_type, model_cfg=model_cfg, optimizer=optimizer,
            clip_weights=clip_weights,
            teacher_cfg=teacher_cfg, teacher_params=teacher_params,
            teacher_stats=teacher_stats, distill_alpha=distill_alpha,
            distill_temp=distill_temp,
        )
        return st, metrics

    state, metrics = jax.lax.scan(body, state, (idx_chunk, keys))
    return state, metrics


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_type", "model_cfg", "optimizer", "clip_weights", "height",
        "width", "tile_b", "interpret", "mesh", "identity_augment",
    ),
)
def scanned_train_steps_fused(
    state: TrainState,
    gather_dataset: jnp.ndarray,  # (2N, R, 128) prepare_gather_dataset output
    device_labels: jnp.ndarray,   # (N,)
    idx_chunk: jnp.ndarray,       # (K, B) indices for K consecutive steps
    key: jax.Array,
    *,
    model_type: str,
    model_cfg,
    optimizer: optax.GradientTransformation,
    height: int,
    width: int,
    clip_weights: bool = True,
    tile_b: int = 64,
    interpret: bool = False,
    mesh=None,
    identity_augment: bool = False,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """`scanned_train_steps` with the entire input path collapsed to ONE
    Pallas kernel per step (ops/input_pipeline.py) and every per-step
    random draw, label gather, and flip decision hoisted OUT of the scan
    body — the dispatch-floor fix from the train roofline
    (docs/TRAIN_ROOFLINE.md: the step is per-kernel-launch bound, so the
    ~7 gather/augment kernels per iteration were most of the step).

    Semantics: the production "light" augmentation tier (the flagship
    NNUE config) — distribution-identical to scanned_train_steps(
    strength="light", augment=True); the RNG stream differs (one batched
    per-dispatch draw instead of per-step key splits).

    ``mesh``: a data-parallel `jax.sharding.Mesh` (axis "data"). The
    Pallas gather kernel is then `shard_map`-ped over the data axis —
    each chip gathers its batch shard from its local (replicated) copy
    of the gather dataset, exactly the serving recipe
    (__graft_entry__.py dryrun) — while the surrounding train step stays
    GSPMD (grads psum over ICI). Without this, a mesh run would fall
    back to the unfused path and pay the dispatch floor (VERDICT r4).

    ``identity_augment``: replace the drawn parameters with no-ops (no
    flip / α=1 / empty hole) so the fused step equals the unfused
    ``augment=False`` step bit-for-bit — used by the multi-chip dryrun
    and tests to prove fused/unfused loss equality under a mesh."""
    from nnue_vision_tpu.ops.input_pipeline import (
        draw_light_params,
        fused_light_pipeline,
        identity_light_params,
    )

    steps, _batch = idx_chunk.shape
    n = device_labels.shape[0]
    if identity_augment:
        params = identity_light_params(steps, idx_chunk.shape[1])
    else:
        params = draw_light_params(
            key, steps, idx_chunk.shape[1], height, width)
    idx_eff = (idx_chunk + n * params.flip.astype(jnp.int32)).astype(jnp.int32)
    labels_chunk = jnp.take(device_labels, idx_chunk, axis=0)  # (K, B)

    pipeline = functools.partial(
        fused_light_pipeline, h=height, w=width, tile_b=tile_b,
        interpret=interpret,
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        pipeline = jax.shard_map(
            pipeline, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,  # pallas out_shape carries no vma annotation
        )

    def body(carry, inp):
        st = carry
        idx_e, labels, pf, pi = inp
        x = pipeline(gather_dataset, idx_e, pf, pi)
        st, metrics = train_step(
            st, x, labels,
            model_type=model_type, model_cfg=model_cfg, optimizer=optimizer,
            clip_weights=clip_weights,
        )
        return st, metrics

    state, metrics = jax.lax.scan(
        body, state, (idx_eff, labels_chunk, params.pf, params.pi)
    )
    return state, metrics


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_type", "model_cfg", "optimizer", "clip_weights", "strength",
        "augment", "teacher_cfg", "distill_alpha", "distill_temp",
    ),
)
def gathered_train_step(
    state: TrainState,
    device_images: jnp.ndarray,   # (N, H, W, 3) full dataset on device
    device_labels: jnp.ndarray,   # (N,)
    idx: jnp.ndarray,             # (B,) batch indices
    key: jax.Array,
    *,
    model_type: str,
    model_cfg,
    optimizer: optax.GradientTransformation,
    strength: str = "medium",
    augment: bool = True,
    clip_weights: bool = True,
    teacher_cfg=None,
    teacher_params=None,
    teacher_stats=None,
    distill_alpha: float = 0.5,
    distill_temp: float = 4.0,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Device-resident input pipeline: gather batch by index → augment →
    normalize → train step, all in ONE compiled program. Removes the
    per-step host→device pixel upload (the dominant cost on tunneled or
    PCIe-bound hosts) — only the (B,) index vector crosses the wire."""
    from nnue_vision_tpu.data.augment import preprocess_batch

    images = jnp.take(device_images, idx, axis=0)
    labels = jnp.take(device_labels, idx, axis=0)
    x = preprocess_batch(key, images, strength=strength, augment=augment)
    return train_step(
        state, x, labels,
        model_type=model_type, model_cfg=model_cfg, optimizer=optimizer,
        clip_weights=clip_weights,
        teacher_cfg=teacher_cfg, teacher_params=teacher_params,
        teacher_stats=teacher_stats, distill_alpha=distill_alpha,
        distill_temp=distill_temp,
    )


@functools.partial(jax.jit, static_argnames=("model_type", "model_cfg"))
def eval_step(
    params,
    batch_stats,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    model_type: str,
    model_cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (summed CE loss over batch, logits)."""
    if model_type == "nnue":
        logits = nnue_apply(params, images, model_cfg)
    else:
        logits, _ = etinynet_apply(params, batch_stats, images, model_cfg, train=False)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).sum()
    return loss, logits
