"""EtinyNet — TPU-native training model (LB / DLB tinyML CNN).

Capability parity with the reference (nnue.py:93-444): same four variants
("1.0", "0.75", "0.98M", "micro") with identical stage tables, stem conv
3x3 s2, Linear Depthwise Blocks (pw-expand → BN → ReLU6 → dw 3x3 → BN →
ReLU6 → pw-project → BN, residual when stride=1 & in==out), Dense LB
(concat input with LB output → 1x1 projection → BN), final 1x1 conv +
global average pool + linear classifier.

TPU-first design decisions:
* NHWC layout throughout; depthwise via `feature_group_count` — both map
  directly onto the TPU conv unit. bfloat16 compute optional.
* Pure functions over (params, batch_stats) pytrees; BatchNorm running
  stats are explicit state threaded through `etinynet_apply`, so the whole
  train step stays jit/pjit-compatible with no mutable modules.
* Serialization folds BatchNorm into conv weights wherever the `.etiny` v1
  format can carry it (the reference serializes UNFOLDED weights with zero
  biases — serialize.py:267-269 — making its int8 engine output nearly
  unrelated to the trained model; we fold: pw_expand gets scale+bias,
  dw/pw_project get scale with bias dropped — the format has no slot).
* Stride-2 dense blocks are tagged as plain LB on serialization so the
  engine tracks spatial dims correctly (see ops/engine_sim.py for the
  upstream scrambling quirk this avoids).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nnue_vision_tpu.formats import (
    QConv,
    QLBBlock,
    QLinear,
    QuantizedEtinyNet,
)
from nnue_vision_tpu.quantize import quantize_bias_i32, quantize_weight_i8

# Stage tables (reference nnue.py:199-296). Each stage is a list of
# (in, mid, out) triples expanded per block; first block of each stage has
# stride 2. Stages 1-2 are LB, stages 3-4 are DLB.
ETINYNET_VARIANTS = {
    "1.0": {
        "conv_channels": 32,
        "stage1": [(32, 32, 32)] * 4,
        "stage2": [(32, 128, 128)] + [(128, 128, 128)] * 3,
        "stage3": [(128, 192, 192)] + [(192, 192, 192)] * 2,
        "stage4": [(192, 256, 256)] + [(256, 256, 256)] * 1,
        "final_channels": 1280,
    },
    "0.75": {
        "conv_channels": 24,
        "stage1": [(24, 24, 24)] * 3,
        "stage2": [(24, 96, 96)] + [(96, 96, 96)] * 2,
        "stage3": [(96, 144, 144)] + [(144, 144, 144)] * 2,
        "stage4": [(144, 192, 192)] + [(192, 192, 192)] * 1,
        "final_channels": 960,
    },
    "0.98M": {
        "conv_channels": 28,
        "stage1": [(28, 28, 28)] * 3,
        "stage2": [(28, 112, 112)] + [(112, 112, 112)] * 2,
        "stage3": [(112, 168, 168)] + [(168, 168, 168)] * 2,
        "stage4": [(168, 224, 224)] + [(224, 224, 224)] * 1,
        "final_channels": 1120,
    },
    "micro": {
        "conv_channels": 8,
        "stage1": [(8, 8, 8)],
        "stage2": [(8, 16, 16), (16, 16, 16)],
        "stage3": [(16, 24, 24), (24, 24, 24)],
        "stage4": [(24, 32, 32), (32, 32, 32)],
        "final_channels": 128,
    },
}

BN_EPS = 1e-5
BN_MOMENTUM = 0.9


@dataclasses.dataclass(frozen=True)
class EtinyNetConfig:
    variant: str = "1.0"
    num_classes: int = 1000
    input_size: int = 112
    use_asq: bool = False
    asq_bits: int = 4
    dtype: str = "float32"
    # Train the exact function the int8 engine can represent: scale-only
    # norms where the format has no bias slot (dw/project), no residual or
    # dense paths (the engine never executes them), straight-through
    # quantizers matching the engine's truncating integer activations
    # (ReLU6 at 7 levels, 1/16-grid block boundaries). Serialized models
    # then evaluate in the engine with near-zero accuracy loss.
    engine_friendly: bool = False
    # With engine_friendly=True and ef_quantizers=False the model keeps the
    # engine STRUCTURE (scale-only norms, no residual/dense paths, the same
    # clamp ranges) but stays continuous: no straight-through quantizers, no
    # weight rounding. Params/state pytrees are identical to the quantized
    # mode, so progressive quantization (training/loop.py ef_warmup_epochs)
    # can warm up here and switch the quantizers on mid-run — the switch
    # then perturbs only by rounding, not by changing the function family.
    # Measured motivation: warming up on the UNCONSTRAINED float model and
    # switching collapses to chance (the float net's BN biases and residual
    # paths have no engine representation); warming up here does not.
    ef_quantizers: bool = True

    def __post_init__(self):
        if (self.engine_friendly and self.ef_quantizers
                and self.dtype != "float32"):
            # The deployed-exactness contract (training on the serializer's
            # exact int8 grids, _wq_folded/_q_act_lsq) is specified in f32
            # rounding; bf16 compute would train on a subtly different grid
            # than serialize.py writes. Loud warning, not an error — the
            # shipped configs never combine these.
            import warnings

            warnings.warn(
                "engine_friendly QAT with dtype="
                f"{self.dtype!r}: the quantizer grids are defined in "
                "float32 — deployed bit-exactness is only validated for "
                "dtype='float32'",
                stacklevel=2,
            )

    @property
    def table(self) -> dict:
        if self.variant not in ETINYNET_VARIANTS:
            raise ValueError(f"unknown EtinyNet variant: {self.variant}")
        return ETINYNET_VARIANTS[self.variant]

    def block_specs(self) -> List[Tuple[str, int, int, int, int, bool]]:
        """[(kind, in, mid, out, stride, dense)] in forward order.

        The first block of every stage gets stride 2; the input channels of
        each stage's first block come from the previous stage's output
        (reference nnue.py:320-410).
        """
        t = self.table
        specs = []
        prev = t["conv_channels"]
        for stage, dense in (("stage1", False), ("stage2", False),
                             ("stage3", True), ("stage4", True)):
            for i, (_, mid, out) in enumerate(t[stage]):
                stride = 2 if i == 0 else 1
                specs.append(("dlb" if dense else "lb", prev, mid, out, stride, dense))
                prev = out
        return specs


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(rng, shape):
    # torch Conv2d default: U(±1/sqrt(fan_in)); shape is HWIO.
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(max(1, fan_in))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def _bn_init(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
    }


def _bn_state(ch):
    return {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def etinynet_init(rng: jax.Array, cfg: EtinyNetConfig) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats)."""
    t = cfg.table
    specs = cfg.block_specs()
    keys = iter(jax.random.split(rng, 8 + 5 * len(specs)))
    params: Dict = {
        "stem_w": _conv_init(next(keys), (3, 3, 3, t["conv_channels"])),  # HWIO
        "stem_bn": _bn_init(t["conv_channels"]),
        "blocks": [],
        "final_w": _conv_init(next(keys), (1, 1, specs[-1][3], t["final_channels"])),
        "final_bn": _bn_init(t["final_channels"]),
    }
    state: Dict = {
        "stem_bn": _bn_state(t["conv_channels"]),
        "blocks": [],
        "final_bn": _bn_state(t["final_channels"]),
    }
    for kind, in_c, mid, out, stride, dense in specs:
        bn1 = _bn_init(mid)
        if cfg.engine_friendly:
            # start pre-activations centered inside the 7-level [0,6] grid
            # so the round-STE passes signal from step one
            bn1 = {"scale": bn1["scale"], "bias": jnp.full((mid,), 1.5)}
        bp = {
            "pw_expand_w": _conv_init(next(keys), (1, 1, in_c, mid)),
            "bn1": bn1,
            "dw_w": _conv_init(next(keys), (3, 3, 1, mid)),
            "bn2": _bn_init(mid),
            "pw_project_w": _conv_init(next(keys), (1, 1, mid, out)),
            "bn3": _bn_init(out),
        }
        if cfg.engine_friendly:
            # LSQ per-channel activation scales for the two 7-level
            # quantizer sites, stored in log space (weight decay pulls the
            # log toward 0 = scale 1, the neutral grid). Only ef models
            # carry them — plain configs keep exact upstream param counts.
            bp["qlog1"] = jnp.zeros((mid,), jnp.float32)
            bp["qlog2"] = jnp.zeros((mid,), jnp.float32)
        bs = {"bn1": _bn_state(mid), "bn2": _bn_state(mid), "bn3": _bn_state(out)}
        if dense and stride == 1 and in_c == out:
            bp["dense_proj_w"] = _conv_init(next(keys), (1, 1, in_c + out, out))
            bp["dense_bn"] = _bn_init(out)
            bs["dense_bn"] = _bn_state(out)
        params["blocks"].append(bp)
        state["blocks"].append(bs)
    if cfg.engine_friendly:
        params["final_qlog"] = jnp.zeros((t["final_channels"],), jnp.float32)
    cls_bound = 1.0 / math.sqrt(t["final_channels"])
    params["cls_w"] = jax.random.uniform(
        next(keys), (cfg.num_classes, t["final_channels"]), jnp.float32,
        -cls_bound, cls_bound,
    )
    params["cls_b"] = jax.random.uniform(
        next(keys), (cfg.num_classes,), jnp.float32, -cls_bound, cls_bound
    )
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _batch_norm(x, p, s, train: bool):
    """Standard BN over NHWC; returns (y, new_state).

    Statistics and the affine always run in float32 — params/state are
    f32, and bf16 batch moments would drift the running stats — but the
    output is cast back to x.dtype so a bfloat16 activation flow stays
    bfloat16 into the next conv (a no-op in the default f32 mode)."""
    xf = x.astype(jnp.float32)
    if train:
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        new_s = {
            "mean": BN_MOMENTUM * s["mean"] + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * s["var"] + (1 - BN_MOMENTUM) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (xf - mean) * (inv * p["scale"]) + p["bias"]
    return y.astype(x.dtype), new_s


def _rms_norm(x, p, s, train: bool):
    """Scale-only normalization: y = x·g/sqrt(E[x²]+eps).

    Exactly foldable into the preceding conv (pure per-channel scale) —
    used for the dw/project norms in engine_friendly mode, where the
    `.etiny` format has no bias slot. Reuses the BN state layout with
    mean-square stored in "var" and "mean" kept at zero.
    """
    xf = x.astype(jnp.float32)
    if train:
        ms = (xf * xf).mean(axis=(0, 1, 2))
        new_s = {
            "mean": s["mean"],
            "var": BN_MOMENTUM * s["var"] + (1 - BN_MOMENTUM) * ms,
        }
    else:
        ms = s["var"]
        new_s = s
    y = xf * (p["scale"] * jax.lax.rsqrt(ms + BN_EPS))
    return y.astype(x.dtype), new_s


def _ste(x, quantized):
    """Straight-through: quantized forward, identity gradient."""
    return x + jax.lax.stop_gradient(quantized - x)


def _wq_folded(w_hwio, norm_p, norm_s, scale: float, out_mul=None, in_mul=None):
    """Weight fake-quantization on the SERIALIZER's int8 grid, as folded.

    The serializer quantizes the norm-folded weight w·k at `scale`
    (quantize.py:22-26 — round, clip ±127); training that never saw this
    rounding pays an accuracy gap at deployment. Here the conv uses
    ŵ = clip(round(w·f·scale))/scale / f with a straight-through gradient,
    so engine_friendly training optimizes the EXACT deployed weights.
    f = k·out_mul (per out-channel) × in_mul (per in-channel): k is the
    norm gain from the RUNNING statistics and out_mul/in_mul carry the LSQ
    activation scales the serializer folds into this conv (stop-gradient —
    the scales train through the activation quantizers, not the weight
    grid). Bias rounding (int32 at scale ≥1024) is negligible and not
    modeled.
    """
    k = norm_p["scale"] * jax.lax.rsqrt(norm_s["var"] + BN_EPS)
    if out_mul is not None:
        k = k * out_mul
    f = jax.lax.stop_gradient(k).reshape((1, 1, 1, -1))  # out-ch is last (HWIO)
    if in_mul is not None:
        f = f * jax.lax.stop_gradient(in_mul).reshape((1, 1, -1, 1))
    q = jnp.clip(jnp.round(w_hwio * f * scale), -127.0, 127.0) / (scale * f)
    return w_hwio + jax.lax.stop_gradient(q - w_hwio)


def _wq_plain(w, scale: float):
    """Plain int8-grid fake-quantization (classifier: no norm to fold)."""
    q = jnp.clip(jnp.round(w * scale), -127.0, 127.0) / scale
    return w + jax.lax.stop_gradient(q - w)


def _q_relu6_int(x):
    """Engine activation: clamp(trunc(u), 0, 6) — 7 integer levels."""
    return _ste(x, jnp.clip(jnp.floor(jnp.clip(x, 0.0, 6.0)), 0.0, 6.0))


def _q_relu6_round(x):
    """Round-variant 7-level activation for the pw_expand stage: the
    serializer folds +0.5 into the (existing) bias slot, turning the
    engine's truncation into rounding — gentler quantization noise."""
    return _ste(x, jnp.clip(jnp.round(jnp.clip(x, 0.0, 6.0)), 0.0, 6.0))


def _q_act_lsq(x, s, round_fn, restore=None):
    """LSQ 7-level activation with learnable per-channel scale s:
    value = clip(round_fn(x/s), 0, 6) · s (or · `restore` when the
    deployed restore multiplier differs from the training scale — the
    final-block amplifier serializes as round(64·s)/64, see the
    serializer's diag(s3) quantization).

    Straight-through on round_fn; autodiff then yields the LSQ scale
    gradient automatically: ∂/∂s = round(z)−z in-range, 0 or 6 at the clip
    rails (z = x/s). The engine realizes this exactly: the serializer
    divides the preceding folded conv by s (per out-channel) and multiplies
    s back into the next conv's input columns — the int grid stays 7 levels
    and the format untouched, but the network chooses each channel's
    quantization window. Measured necessity: with fixed s=1 the 7-level
    rounding collapses a 0.82-val continuous model to 0.12; the post-hoc
    resolution sweep shows the information lives below the 1.0 step.
    """
    z = x / s
    zq = jnp.clip(_ste(z, round_fn(z)), 0.0, 6.0)
    return zq * (s if restore is None else restore)


def _q_grid16(x):
    """Engine block boundary: trunc(16·v)/16, clamp ±127/16."""
    lim = 127.0 / 16.0
    return _ste(x, jnp.trunc(jnp.clip(x, -lim, lim) * 16.0) / 16.0)


def _conv(x, w_hwio, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, w_hwio,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)) if w_hwio.shape[0] == 3 else ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def etinynet_apply(
    params: Dict,
    state: Dict,
    images: jnp.ndarray,
    cfg: EtinyNetConfig,
    train: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Forward: (B, H, W, 3) → (logits (B, classes), new batch_stats)."""
    dtype = jnp.dtype(cfg.dtype)
    ef = cfg.engine_friendly
    # q: full quantized mode. ef without q = engine structure (scale-only
    # norms, no residual/dense, engine clamp ranges) but continuous values —
    # the progressive-quantization warmup function (see EtinyNetConfig).
    q = ef and cfg.ef_quantizers
    _grid16_lim = 127.0 / 16.0
    x = images.astype(dtype)
    new_state: Dict = {"blocks": []}

    stem_w = params["stem_w"]
    if q:
        # train on the serializer's exact int8 weight grids (scales from
        # etinynet_quantize: stem 16, everything else 64)
        stem_w = _wq_folded(stem_w, params["stem_bn"], state["stem_bn"], 16.0)
    x = _conv(x, stem_w.astype(dtype), stride=2)
    x, new_state["stem_bn"] = _batch_norm(x, params["stem_bn"], state["stem_bn"], train)
    # engine stem has no activation — its output is clamped ±127 ints at
    # 16·v; the reference model's ReLU6 here is replaced by the boundary
    # quantizer in engine_friendly mode.
    if q:
        x = _q_grid16(x)
    elif ef:
        x = jnp.clip(x, -_grid16_lim, _grid16_lim)
    else:
        x = jnp.clip(x, 0.0, 6.0)

    specs = cfg.block_specs()
    mid_norm = _rms_norm if ef else _batch_norm
    for (kind, in_c, mid, out, stride, dense), bp, bs in zip(
        specs, params["blocks"], state["blocks"]
    ):
        identity = x
        ns = {}
        pw_e_w, dw_w, pw_p_w = bp["pw_expand_w"], bp["dw_w"], bp["pw_project_w"]
        if ef:
            s1f = jnp.exp(bp["qlog1"])
            s2f = jnp.exp(bp["qlog2"])
            s1, s2 = s1f.astype(dtype), s2f.astype(dtype)
        if q:
            pw_e_w = _wq_folded(pw_e_w, bp["bn1"], bs["bn1"], 64.0,
                                out_mul=1.0 / s1f)
            dw_w = _wq_folded(dw_w, bp["bn2"], bs["bn2"], 64.0,
                              out_mul=s1f / s2f)
            pw_p_w = _wq_folded(pw_p_w, bp["bn3"], bs["bn3"], 64.0, in_mul=s2f)
        h = _conv(x, pw_e_w.astype(dtype))
        h, ns["bn1"] = _batch_norm(h, bp["bn1"], bs["bn1"], train)
        if q:
            h = _q_act_lsq(h, s1, jnp.round)
        elif ef:
            h = jnp.clip(h, 0.0, 6.0 * s1)
        else:
            h = jnp.clip(h, 0.0, 6.0)
        h = _conv(h, dw_w.astype(dtype), stride=stride, groups=mid)
        h, ns["bn2"] = mid_norm(h, bp["bn2"], bs["bn2"], train)
        if q:
            h = _q_act_lsq(h, s2, jnp.floor)
        elif ef:
            h = jnp.clip(h, 0.0, 6.0 * s2)
        else:
            h = jnp.clip(h, 0.0, 6.0)
        h = _conv(h, pw_p_w.astype(dtype))
        h, ns["bn3"] = mid_norm(h, bp["bn3"], bs["bn3"], train)
        if q:
            h = _q_grid16(h)
        elif ef:
            h = jnp.clip(h, -_grid16_lim, _grid16_lim)

        use_residual = stride == 1 and in_c == out and not ef
        if use_residual:
            h = h + identity
        if dense and use_residual:
            cat = jnp.concatenate([identity, h], axis=-1)
            h = _conv(cat, bp["dense_proj_w"].astype(dtype))
            h, ns["dense_bn"] = _batch_norm(h, bp["dense_bn"], bs["dense_bn"], train)
        elif "dense_bn" in bs:
            # engine_friendly skips the dense path but must preserve the
            # state structure so checkpoints stay mode-portable
            ns["dense_bn"] = bs["dense_bn"]
        new_state["blocks"].append(ns)
        x = h

    final_w = params["final_w"]
    cls_w = params["cls_w"]
    if ef:
        # clip to the serializer's representable range (|64·s3| must fit
        # int8 — see serialize_etinynet's amplifier diag) so training
        # optimizes the SAME function the engine will realize even if a
        # channel's scale runs away
        s3f = jnp.clip(
            jnp.exp(params["final_qlog"]), 1.0 / 64.0, 127.0 / 64.0
        )
        s3 = s3f.astype(dtype)
    if q:
        final_w = _wq_folded(final_w, params["final_bn"], state["final_bn"],
                             64.0, out_mul=1.0 / s3f)
        cls_w = _wq_plain(cls_w, 64.0)
    x = _conv(x, final_w.astype(dtype))
    x, new_state["final_bn"] = _batch_norm(x, params["final_bn"], state["final_bn"], train)
    if q:
        # Deployment restores this activation through the amplifier
        # diag, which serializes as round(64·s3)/64 per channel — use
        # that exact multiplier (straight-through for the s3 gradient)
        # so there is no train/deploy drift (ADVICE r2).
        s3_deploy = _ste(s3, jnp.round(s3 * 64.0) / 64.0)
        x = _q_act_lsq(x, s3, jnp.round, restore=s3_deploy)
    elif ef:
        x = jnp.clip(x, 0.0, 6.0 * s3)
    else:
        x = jnp.clip(x, 0.0, 6.0)
    x = x.mean(axis=(1, 2))  # global average pool

    logits = x @ cls_w.T.astype(dtype) + params["cls_b"].astype(dtype)
    return logits.astype(jnp.float32), new_state


def count_parameters(params: Dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# quantization → QuantizedEtinyNet
# ---------------------------------------------------------------------------


def _fold_bn(w_hwio: np.ndarray, bn_p: Dict, bn_s: Dict):
    """Fold inference-time BN into the preceding conv.

    y = (conv(x) - m) * g/sqrt(v+eps) + b  →  conv'(x) + bias'
    with conv' = conv scaled per out-channel and bias' = b - m*g/sqrt(v+eps).
    """
    g = np.asarray(bn_p["scale"], np.float64)
    b = np.asarray(bn_p["bias"], np.float64)
    m = np.asarray(bn_s["mean"], np.float64)
    v = np.asarray(bn_s["var"], np.float64)
    k = g / np.sqrt(v + BN_EPS)
    return np.asarray(w_hwio, np.float64) * k, b - m * k


# Inter-block amplification: every boundary (stem output and block
# projections) carries 16×its float value — range ±7.94 covers ReLU6's
# [0,6], resolution 1/16 — and every consumer's divisor absorbs the gain.
_GAIN = 16


def etinynet_quantize(
    params: Dict, state: Dict, cfg: EtinyNetConfig
) -> QuantizedEtinyNet:
    """float (params, batch_stats) → engine-domain QuantizedEtinyNet.

    BN folding policy (the `.etiny` v1 format constrains what can be
    carried — see module docstring):
      stem + pw_expand: scale folded into weights, bias into the int32 slot.
      dw / pw_project: scale folded into weights; bias has no format slot
        and is dropped (documented accuracy loss, still far closer to the
        trained model than the reference's fully-unfolded export).
      dense_proj / residuals: not representable in the format at all
        (upstream engine never executes them); dropped, as upstream does.
    Stride-2 dense blocks are tagged LB so the engine's spatial-dim
    tracking stays correct.

    ENGINE-FAITHFUL value scales. The engine's integer pipeline implies a
    value scale at every boundary; the format's three per-block f32 scales
    absorb them so the engine computes the float model (reference citations
    in ops/engine_sim.py):

      stem:      weights at 16 → out = 16·v (acc = Σ int(x·64)·round(16w),
                 /64; the ±127 clamp then allows v ∈ ±7.94, covering the
                 model's ReLU6 range — at weight scale 64 the stem would
                 saturate at v = ±1.98), bias = round(1024·b)
      pw_expand: weights at 64, divisor = 64·16 = 1024,
                 bias = round(1024·b); the engine clamp[0,6] then IS float
                 ReLU6 at value scale 1
      dw:        weights at 64, divisor 64; clamp[0,6] = ReLU6
      pw_project:weights at 64, divisor 4 → outputs at 16·v
      classifier: pooled = 16·f → file scale 1024, bias round(1024·b)

    The reference serializer writes uniform 64s (serialize.py:143-145),
    making its engine clamp activations at float 6/64 ≈ 0.094 and add
    biases 64× too small — its int8 EtinyNet computed a different function.

    The model's final 1x1 conv + BN + ReLU6 (which the reference drops
    entirely — serialize.py:317-351, leaving its engine classifier reading
    out-of-bounds pooled memory) is encoded as a synthetic LB block:
    pw_expand = folded final conv, identity depthwise, amplifying identity
    projection.
    """
    p = jax.device_get(params)
    s = jax.device_get(state)
    t = cfg.table

    stem_w, stem_b = _fold_bn(p["stem_w"], p["stem_bn"], s["stem_bn"])
    stem = QConv(
        weight=quantize_weight_i8(
            np.transpose(stem_w, (3, 2, 0, 1)), scale=float(_GAIN)
        ),  # OIHW, weight scale 16 → output at 16·v
        bias=quantize_bias_i32(stem_b, scale=64.0 * _GAIN),
    )

    def lsq_s(container, key, n):
        """exp(qlog) as float64, or ones when the model carries no LSQ
        scales (plain configs — the folding below is then an identity)."""
        if key in container:
            return np.exp(np.asarray(container[key], np.float64))
        return np.ones(n, np.float64)

    blocks = []
    alpha = _GAIN  # amplification of this block's input
    for (kind, in_c, mid, out, stride, dense), bp, bs in zip(
        cfg.block_specs(), p["blocks"], s["blocks"]
    ):
        pw_e, pw_e_bias = _fold_bn(bp["pw_expand_w"], bp["bn1"], bs["bn1"])
        dw, _ = _fold_bn(bp["dw_w"], bp["bn2"], bs["bn2"])
        pw_p, _ = _fold_bn(bp["pw_project_w"], bp["bn3"], bs["bn3"])
        # LSQ per-channel activation scales (see _q_act_lsq): the engine's
        # int grid h = clamp(rnd(acc/divisor),0,6) realizes h = rnd(v/s_c)
        # by dividing the producing conv by s_c per out-channel, and the
        # float value h·s_c is restored by multiplying s_c into the
        # consumer's per-input-channel weights. The format and engine are
        # untouched; only the folded weights change.
        s1 = lsq_s(bp, "qlog1", mid)
        s2 = lsq_s(bp, "qlog2", mid)
        pw_e = pw_e / s1
        pw_e_bias = pw_e_bias / s1
        dw = dw * (s1 / s2)  # dw is per-channel: consumes s1, produces /s2
        pw_p = pw_p * s2.reshape(1, 1, -1, 1)  # consume s2 per input column
        if cfg.engine_friendly:
            # the model trained with ROUND 7-level activations at this
            # stage; +0.5 in the bias turns the engine's truncation into
            # rounding (trunc(u + 0.5) = round(u) on the clamped range)
            pw_e_bias = pw_e_bias + 0.5
        s_expand = 64.0 * alpha
        blocks.append(
            QLBBlock(
                pw_expand=quantize_weight_i8(pw_e[0, 0].T),  # (mid, in)
                dw=quantize_weight_i8(np.transpose(dw[:, :, 0, :], (2, 0, 1))),
                pw_project=quantize_weight_i8(pw_p[0, 0].T),  # (out, mid)
                stride=stride,
                is_dense=bool(dense and stride == 1),
                pw_expand_scale=s_expand,
                dw_scale=64.0,
                pw_project_scale=64.0 / _GAIN,
                pw_expand_bias=quantize_bias_i32(pw_e_bias, scale=s_expand),
            )
        )
        alpha = _GAIN

    # Synthetic final block: folded final conv + identity dw + amplifier.
    fin = t["final_channels"]
    final_w, final_b = _fold_bn(p["final_w"], p["final_bn"], s["final_bn"])
    # final-activation LSQ scales: conv divided by s3 per channel; the
    # amplifier projection (which the classifier's 1024 scale expects to
    # emit 16·v) multiplies s3 back. |64·s3| must fit int8, so s3 is capped
    # at serialization (training keeps it near 1 via weight decay on the
    # log; the cap only bites on runaway scales).
    s3 = np.clip(lsq_s(p, "final_qlog", fin), 1.0 / 64.0, 127.0 / 64.0)
    final_w = final_w / s3
    final_b = final_b / s3
    if cfg.engine_friendly:
        final_b = final_b + 0.5  # round semantics, as above
    dw_identity = np.zeros((fin, 3, 3), np.int8)
    dw_identity[:, 1, 1] = 64
    s_expand = 64.0 * alpha
    blocks.append(
        QLBBlock(
            pw_expand=quantize_weight_i8(final_w[0, 0].T),  # (fin, last_out)
            dw=dw_identity,
            pw_project=quantize_weight_i8(np.diag(s3)),  # eye·64·s3
            stride=1,
            is_dense=False,
            pw_expand_scale=s_expand,
            dw_scale=64.0,
            pw_project_scale=64.0 / _GAIN,
            pw_expand_bias=quantize_bias_i32(final_b, scale=s_expand),
        )
    )

    return QuantizedEtinyNet(
        variant=cfg.variant,
        num_classes=cfg.num_classes,
        input_size=cfg.input_size,
        conv_channels=t["conv_channels"],
        final_channels=fin,
        stem=stem,
        blocks=blocks,
        classifier=QLinear(
            weight=quantize_weight_i8(p["cls_w"]),
            bias=quantize_bias_i32(p["cls_b"], scale=64.0 * _GAIN),
            scale=64.0 * _GAIN,
        ),
        use_asq=cfg.use_asq,
        asq_bits=cfg.asq_bits,
    ).validate()
