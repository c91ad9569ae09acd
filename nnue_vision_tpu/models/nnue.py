"""NNUE for vision — TPU-native training model.

Capability-parity with the reference model (nnue.py:447-738) but designed
for XLA, not translated from torch:

* The reference converts the binarized conv output to variable-length sparse
  (indices, values) lists with per-sample Python loops and gathers
  (nnue.py:590-635, :686-710) — a host-sync disaster and impossible under
  jit. Here the binary mask IS the feature vector and the feature
  transformer is one dense masked matmul `mask @ W + b`, mathematically
  identical to the reference's gather-sum (values are exactly {0,1}) and an
  MXU-native op.
* The straight-through estimator reproduces the reference gradient contract
  (nnue.py:15-54) via `jax.custom_vjp`: identity gradient to the input,
  sharpness-10 sigmoid surrogate summed over batch+space for the per-channel
  threshold.
* Train-time geometry follows the ENGINE's stride rule
  (ceil((H-1)/(grid-1)), nnue_engine.cpp:667-675) and the engine's
  flat-placement of conv output into the grid buffer, so the features the
  model trains on are the features the int8 engine computes. (The reference
  trains on a different grid than its engine evaluates — train/infer skew we
  deliberately fix; see SURVEY.md §7 hard-part 5.)
* Optional quantization-aware clamps (`qat=True`) keep activations in the
  engine's [0, 127]/127 dynamic range during training so int8 serialization
  loses less accuracy.

Pure functions over a params pytree — no module framework. `nnue_init`
builds params; `nnue_apply` is jit/pjit/vmap-compatible.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.formats import (
    QConv,
    QFeatureTransformer,
    QLinear,
    QuantizedNNUE,
)
from nnue_vision_tpu.ops.engine_sim import engine_conv_stride
from nnue_vision_tpu.quantize import (
    QUANT_SCALE,
    clip_unit,
    quantize_bias_i32,
    quantize_weight_i8,
)

DEFAULT_L1 = 1024
DEFAULT_L2 = 128
DEFAULT_L3 = 32


@dataclasses.dataclass(frozen=True)
class LossParams:
    """Score-space loss shaping constants (API parity with nnue.py:63-72
    upstream, where the dataclass is declared but the trainer uses plain
    cross-entropy — same here; kept for config compatibility)."""

    in_offset: float = 270.0
    out_offset: float = 270.0
    in_scaling: float = 340.0
    out_scaling: float = 380.0
    start_lambda: float = 1.0
    end_lambda: float = 1.0
    pow_exp: float = 2.5
    qp_asymmetry: float = 0.0


@dataclasses.dataclass(frozen=True)
class GridFeatureSet:
    """Grid-based feature set (reference nnue.py:81-91)."""

    grid_size: int = 10
    num_features_per_square: int = 8

    @property
    def num_features(self) -> int:
        return self.grid_size * self.grid_size * self.num_features_per_square


@dataclasses.dataclass(frozen=True)
class NNUEConfig:
    feature_set: GridFeatureSet = GridFeatureSet()
    l1_size: int = DEFAULT_L1
    l2_size: int = DEFAULT_L2
    l3_size: int = DEFAULT_L3
    num_classes: int = 10
    input_size: int = 32
    # Keep activations in the engine's quantized dynamic range during
    # training (clipped ReLU to [0,1] in float ≙ [0,127] int).
    qat: bool = False
    # With qat=True, qat_rounding=False trains the CONTINUOUS model inside
    # the engine clamp ranges (no weight/bias fake-quant) — the warmup
    # phase of progressive NNUE QAT (ef_warmup_epochs in the train config).
    # Same function family as full QAT, perturbation at the switch is only
    # rounding.
    qat_rounding: bool = True
    # Compute dtype for the conv/matmul stack; params stay float32.
    dtype: str = "float32"

    @property
    def conv_stride(self) -> int:
        return engine_conv_stride(self.input_size, self.feature_set.grid_size)

    @property
    def conv_out_hw(self) -> int:
        return (self.input_size + 2 - 3) // self.conv_stride + 1


# ---------------------------------------------------------------------------
# straight-through binary activation
# ---------------------------------------------------------------------------


@jax.custom_vjp
def binary_activation_ste(x: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """Hard threshold forward, straight-through backward (nnue.py:15-59).

    x: (B, H, W, C); threshold: (C,) broadcast per channel.
    Forward: (x > t) as float. Backward: dL/dx = g (straight through);
    dL/dt = -sum_{B,H,W} g * k*sigmoid'(k*(x-t)) with k=10.
    """
    return (x > threshold).astype(x.dtype)


def _ste_fwd(x, threshold):
    return binary_activation_ste(x, threshold), (x, threshold)


def _ste_bwd(res, g):
    x, threshold = res
    k = 10.0
    sig = jax.nn.sigmoid(k * (x - threshold))
    grad_t = -(g * k * sig * (1.0 - sig)).sum(axis=(0, 1, 2))
    return g, grad_t.astype(threshold.dtype)


binary_activation_ste.defvjp(_ste_fwd, _ste_bwd)


# ---------------------------------------------------------------------------
# init / apply
# ---------------------------------------------------------------------------


def _uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def nnue_init(rng: jax.Array, cfg: NNUEConfig) -> Dict:
    """Initialize an NNUE params pytree.

    Init distributions match the reference model's: conv/linear use
    fan-in uniform (torch defaults), feature transformer N(0, 0.1²)
    (nnue.py:683), bias zeros for FT, threshold 0.1 per channel
    (nnue.py:507), nnue2score 600 (nnue.py:503).
    """
    fs = cfg.feature_set
    ch = fs.num_features_per_square
    keys = jax.random.split(rng, 10)
    k_conv = 1.0 / math.sqrt(3 * 3 * 3)
    k1 = 1.0 / math.sqrt(cfg.l1_size)
    k2 = 1.0 / math.sqrt(cfg.l2_size)
    k3 = 1.0 / math.sqrt(cfg.l3_size)
    return {
        "conv_w": _uniform(keys[0], (ch, 3, 3, 3), k_conv),  # OIHW
        "visual_threshold": jnp.full((ch,), 0.1, jnp.float32),
        "ft_w": jax.random.normal(keys[1], (fs.num_features, cfg.l1_size)) * 0.1,
        "ft_b": jnp.zeros((cfg.l1_size,), jnp.float32),
        "fc1_w": _uniform(keys[2], (cfg.l2_size, cfg.l1_size), k1),
        "fc1_b": _uniform(keys[3], (cfg.l2_size,), k1),
        "fc2_w": _uniform(keys[4], (cfg.l3_size, cfg.l2_size), k2),
        "fc2_b": _uniform(keys[5], (cfg.l3_size,), k2),
        "out_w": _uniform(keys[6], (cfg.num_classes, cfg.l3_size), k3),
        "out_b": _uniform(keys[7], (cfg.num_classes,), k3),
        "nnue2score": jnp.float32(600.0),
    }


def _wq(w, scale: float):
    """Weight fake-quantization with a straight-through gradient:
    round(clip(w)·scale)/scale — the exact value the serializer will emit,
    so QAT training sees the deployed weights."""
    q = jnp.round(jnp.clip(w, -1.0, 1.0) * scale) / scale
    return w + jax.lax.stop_gradient(q - w)


def _bq(b, scale: float):
    """Bias fake-quantization (int32 slot: rounded, never clipped)."""
    q = jnp.round(b * scale) / scale
    return b + jax.lax.stop_gradient(q - b)


def nnue_apply(
    params: Dict,
    images: jnp.ndarray,
    cfg: NNUEConfig,
    return_aux: bool = False,
):
    """Forward pass: images (B, H, W, 3) float32 NHWC → logits (B, classes).

    With `return_aux=True` also returns {"density": (B,), "mask": (B, F)}.

    In QAT mode every weight, bias, and activation is fake-quantized to
    exactly what the serialized int8 engine will compute (weights via
    `_wq` at the faithful per-layer scales, activations via the engine's
    clamp ranges), so float validation accuracy predicts deployed accuracy.
    """
    fs = cfg.feature_set
    dtype = jnp.dtype(cfg.dtype)
    x = images.astype(dtype)

    if cfg.qat and cfg.qat_rounding:
        p = dict(params)
        half_cols = cfg.l1_size // 2
        # conv weights are not clipped by the reference; quantize on the
        # ±127/64 representable grid
        cq = jnp.round(jnp.clip(params["conv_w"], -127 / 64, 127 / 64) * 64) / 64
        p["conv_w"] = params["conv_w"] + jax.lax.stop_gradient(
            cq - params["conv_w"]
        )
        p["ft_w"] = _wq(params["ft_w"], 64)
        p["ft_b"] = _bq(params["ft_b"], 64)
        p["fc1_w"] = jnp.concatenate(
            [_wq(params["fc1_w"][:, :half_cols], 64),
             _wq(params["fc1_w"][:, half_cols:], 32)],
            axis=1,
        )
        p["fc1_b"] = _bq(params["fc1_b"], 2048)
        p["fc2_w"] = _wq(params["fc2_w"], 64)
        p["fc2_b"] = _bq(params["fc2_b"], 4096)
        p["out_w"] = _wq(params["out_w"], 64)
        p["out_b"] = _bq(params["out_b"], 4096)
        params = p

    if cfg.qat:
        # Serialization collapses the per-channel thresholds to their
        # channel MEAN (nnue_quantize; upstream nnue.py:556-558 does the
        # same), so the deployed engine compares against one scalar. Train
        # the compare against that same collapsed scalar: with per-channel
        # values the channels drift apart and deployment silently flips
        # whole channels (measured: latent density 0.22 → 0.58 in one
        # epoch, compiled f1 0.90 → 0.44, while float val kept improving —
        # logs/runs/run_20260817_161814). Gradient flows to every channel
        # through the mean, so the parameter stays per-channel shaped.
        t = params["visual_threshold"]
        deployed_thresh = jnp.mean(t, keepdims=True)  # (1,) — the scalar
        params = dict(params)
        params["visual_threshold"] = jnp.broadcast_to(
            deployed_thresh, t.shape
        )
    else:
        deployed_thresh = None

    # Conv frontend, engine-geometry (stride from the engine rule).
    rhs = jnp.transpose(params["conv_w"], (2, 3, 1, 0)).astype(dtype)  # HWIO
    conv = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(cfg.conv_stride, cfg.conv_stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # Binary STE with per-channel learnable threshold.
    mask = binary_activation_ste(conv, params["visual_threshold"].astype(dtype))

    # Engine flat placement: (B, oh, ow, C) → (B, F) with zero tail.
    b = mask.shape[0]
    flat = mask.reshape(b, -1)
    pad = fs.num_features - flat.shape[1]
    if cfg.qat and pad > 0:
        # The engine thresholds the whole zero-filled feature buffer, so
        # the `pad` trailing features are ACTIVE whenever the threshold is
        # negative (nnue_engine.h:246 — buf[f] > thresh with buf[f] == 0).
        # Train that exact semantics: threshold a zero tail through the
        # same STE, so (a) the train metric equals the deploy metric on
        # the cliff's far side, and (b) the surrogate gradient repels the
        # threshold from the cliff edge before it is crossed. Without
        # this, a threshold mean drifting below 0 flips all pad features
        # at deploy only — measured as a one-epoch compiled collapse
        # (density 0.215 → 0.575, f1 0.90 → 0.45) invisible to training.
        # The float path keeps upstream's semantics (always-zero tail);
        # upstream has this deployment cliff.
        pad_feats = binary_activation_ste(
            jnp.zeros((b, 1, pad, 1), dtype),
            deployed_thresh.astype(dtype),
        ).reshape(b, pad)
        features = jnp.concatenate([flat, pad_feats], axis=1)
    else:
        features = jnp.pad(flat, ((0, 0), (0, pad)))

    # Feature transformer as a dense masked matmul (MXU).
    ft = features @ params["ft_w"].astype(dtype) + params["ft_b"].astype(dtype)

    if cfg.qat:
        # Quantization-aware clamps: train inside exactly the dynamic range
        # the int8 engine can represent under the faithful serialization
        # scheme (see nnue_quantize). FT accumulator is int16 clipped to
        # [0, 127] at scale 64 → float [0, 127/64]; pairwise products are
        # stored at scale 32 → clamp at 127/32; hidden activations are int8
        # [0, 127] at scale 64.
        ft = jnp.clip(ft, 0.0, 127.0 / 64.0)
        half = cfg.l1_size // 2
        a, bb = ft[:, :half], ft[:, half:]
        prod = jnp.clip(a * bb, 0.0, 127.0 / 32.0)
        l0 = jnp.concatenate([prod, a], axis=1)
        h1 = jnp.clip(
            l0 @ params["fc1_w"].T.astype(dtype) + params["fc1_b"].astype(dtype),
            0.0, 127.0 / 64.0,
        )
        h2 = jnp.clip(
            h1 @ params["fc2_w"].T.astype(dtype) + params["fc2_b"].astype(dtype),
            0.0, 127.0 / 64.0,
        )
    else:
        # Reference float semantics (nnue.py:660-666): unclamped pairwise +
        # plain ReLU classifier.
        half = cfg.l1_size // 2
        a, bb = ft[:, :half], ft[:, half:]
        l0 = jnp.concatenate([a * bb, a], axis=1)
        h1 = jax.nn.relu(
            l0 @ params["fc1_w"].T.astype(dtype) + params["fc1_b"].astype(dtype)
        )
        h2 = jax.nn.relu(
            h1 @ params["fc2_w"].T.astype(dtype) + params["fc2_b"].astype(dtype)
        )
    logits = h2 @ params["out_w"].T.astype(dtype) + params["out_b"].astype(dtype)
    logits = logits.astype(jnp.float32)

    if return_aux:
        # density over the FULL buffer — the engine's active_count includes
        # the pad features (nnue_inference.cpp:54); identical to the old
        # real-features-only sum whenever the pad tail is inactive.
        density = features.sum(axis=1).astype(jnp.float32) / fs.num_features
        return logits, {"density": density, "mask": features}
    return logits


def nnue_clip_weights(params: Dict) -> Dict:
    """Clamp FT + classifier weights to [-1, 1] (nnue.py:528-539).

    The reference applies this in-place pre-serialization AND implicitly
    relies on it during long training runs; we expose it as a pure update
    that the train loop applies after each optimizer step.
    """
    clipped = dict(params)
    for name in ("ft_w", "fc1_w", "fc2_w", "out_w"):
        clipped[name] = jnp.clip(params[name], -1.0, 1.0)
    return clipped


# ---------------------------------------------------------------------------
# quantization → QuantizedNNUE
# ---------------------------------------------------------------------------


def nnue_quantize(params: Dict, cfg: NNUEConfig) -> QuantizedNNUE:
    """float params → engine-domain QuantizedNNUE (serialize-ready).

    ENGINE-FAITHFUL scheme. The engine's multiclass head mixes value scales
    across its inputs (pairwise products carry scale 32 = 64·64/128, linear
    passthrough 64 — nnue_engine.cpp:493-499 — and biases are added raw to
    the accumulator). The reference serializer ignores this (uniform 64,
    serialize.py:210-239), so its engine computes a DIFFERENT function than
    the trained model — the root cause of its approximate parity. Here the
    format's free parameters absorb the scales so the engine reproduces the
    float model up to rounding:

      FT:  ŵ = round(64w), b̂ = round(64b)                  (value scale 64)
      fc1: product columns at 64, linear columns at 32,
           b̂ = round(2048·b), file scale 32
           → ĥ1 = clamp(64·h1) exactly
      fc2: ŵ = round(64w), b̂ = round(4096·b), file scale 64
      out: ŵ = round(64w), b̂ = round(4096·b), file scale 4096
           → logits = acc/4096 equals the float logits up to rounding

    Weights are clipped to [-1,1] first (reference behavior, nnue.py:528);
    visual_threshold serializes as the channel mean (nnue.py:556-558).
    Train with cfg.qat=True so activations already live inside the clamped
    ranges these scales imply.
    """
    p = jax.device_get(params)
    fs = cfg.feature_set
    half = cfg.l1_size // 2

    fc1_w = clip_unit(p["fc1_w"])
    fc1_q = np.concatenate(
        [
            quantize_weight_i8(fc1_w[:, :half], scale=64.0),
            quantize_weight_i8(fc1_w[:, half:], scale=32.0),
        ],
        axis=1,
    )

    return QuantizedNNUE(
        grid_size=fs.grid_size,
        num_features_per_square=fs.num_features_per_square,
        l1=cfg.l1_size,
        l2=cfg.l2_size,
        l3=cfg.l3_size,
        nnue2score=float(p["nnue2score"]),
        # The engine thresholds the conv OUTPUT INTEGERS, which carry value
        # scale 64 (acc = Σ int(x·64)·round(w·64), out = acc/64 ≈ 64·conv) —
        # so the float threshold must be scaled by 64 on serialization. The
        # reference writes it raw (serialize.py:63 upstream), silently
        # binarizing at threshold/64.
        visual_threshold=float(np.mean(p["visual_threshold"])) * 64.0,
        conv=QConv(
            weight=quantize_weight_i8(p["conv_w"]),
            bias=np.zeros(fs.num_features_per_square, np.int32),  # conv has no bias
        ),
        ft=QFeatureTransformer(
            weight=quantize_weight_i8(clip_unit(p["ft_w"])).astype(np.int16),
            bias=quantize_bias_i32(p["ft_b"]),
        ),
        fc1=QLinear(
            weight=fc1_q,
            bias=quantize_bias_i32(p["fc1_b"], scale=2048.0),
            scale=32.0,
        ),
        fc2=QLinear(
            weight=quantize_weight_i8(clip_unit(p["fc2_w"])),
            bias=quantize_bias_i32(p["fc2_b"], scale=4096.0),
            scale=64.0,
        ),
        out=QLinear(
            weight=quantize_weight_i8(clip_unit(p["out_w"])),
            bias=quantize_bias_i32(p["out_b"], scale=4096.0),
            scale=4096.0,
        ),
    ).validate()


def nnue_from_quantized(q: QuantizedNNUE) -> Tuple[Dict, NNUEConfig]:
    """Dequantize a QuantizedNNUE back into float training params."""
    cfg = NNUEConfig(
        feature_set=GridFeatureSet(q.grid_size, q.num_features_per_square),
        l1_size=q.l1,
        l2_size=q.l2,
        l3_size=q.l3,
        num_classes=q.num_classes,
    )
    s = QUANT_SCALE
    half = q.l1 // 2
    fc1 = np.asarray(q.fc1.weight, np.float32)
    # invert the faithful column scaling (see nnue_quantize): product
    # columns at 64, linear columns at 32
    fc1_w = np.concatenate([fc1[:, :half] / 64.0, fc1[:, half:] / 32.0], axis=1)
    params = {
        "conv_w": jnp.asarray(q.conv.weight, jnp.float32) / s,
        "visual_threshold": jnp.full(
            (q.num_features_per_square,), q.visual_threshold / 64.0, jnp.float32
        ),
        "ft_w": jnp.asarray(q.ft.weight, jnp.float32) / s,
        "ft_b": jnp.asarray(q.ft.bias, jnp.float32) / s,
        "fc1_w": jnp.asarray(fc1_w),
        "fc1_b": jnp.asarray(q.fc1.bias, jnp.float32) / 2048.0,
        "fc2_w": jnp.asarray(q.fc2.weight, jnp.float32) / s,
        "fc2_b": jnp.asarray(q.fc2.bias, jnp.float32) / 4096.0,
        "out_w": jnp.asarray(q.out.weight, jnp.float32) / s,
        "out_b": jnp.asarray(q.out.bias, jnp.float32) / 4096.0,
        "nnue2score": jnp.float32(q.nnue2score),
    }
    return params, cfg


def count_parameters(params: Dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
