"""Bit-exact JAX simulation of the int8 C++ inference engine.

Given a quantized model (the arrays a `.nnue`/`.etiny` file carries) and a
float image, these functions produce logits identical — bit for bit — to the
C++ engine binaries (`nnue_inference` / `etinynet_inference`). They are pure,
jittable, and batch over images with `vmap`-style leading dims, so the same
code is both our parity test harness and the production TPU int8 inference
path (the reference runs one subprocess per image; here a whole batch is one
device launch).

Integer-arithmetic contract reproduced (reference files cited per function):

* input quantization `int32(x * 64.0f)` — float32 multiply then C truncation
  toward zero (nnue_engine.cpp:68,116).
* conv accumulate in int32, output `clamp(acc / 64, ±127)` with C truncating
  division (nnue_engine.cpp:92).
* the engine recomputes the conv stride at runtime as
  `ceil((H-1)/(grid-1))` — NOT the Python-side `(H-1)//(grid-1)`
  (nnue_engine.cpp:667-675). We implement the engine rule.
* conv output is written flat (out_h*out_w*C values) into a zero-filled
  grid²·C buffer and the feature grid re-reads it with grid-sized rows
  (nnue_engine.cpp:679-683, nnue_engine.h:236-253). When out_h < grid this
  scrambles positions — a fixed, bijective index map we reproduce exactly.
* feature-transformer accumulation is int16 with wraparound
  (simd_scalar.cpp:78-95); equivalent to an int32 sum reduced mod 2^16.
* pairwise interaction `(a*b)/128` truncating, clamp [0,127]
  (nnue_engine.cpp:493-499).
* dense layers divide the int32 accumulator by the scale truncating toward
  zero. The engine mixes a float-division variant (simd_scalar.cpp:132-134)
  and an int-division variant (nnue_engine.cpp:520); both equal truncating
  integer division while |acc| < 2^24, which holds for every architecture the
  format admits (l1·127·127 < 2^24 for l1 ≤ 1024 and biases |b·64| < 260k).

Matmuls run on the MXU. Two exactness strategies are used, both proven
bit-equal to the C++ binaries in tests/test_engine_parity.py:

* int8×int8→int32 `dot_general` where accumulators can approach 2^24
  (NNUE dense stack, classifiers);
* integer-valued float32 elsewhere (convs, the whole EtinyNet chain):
  exact below 2^24, with power-of-two-scale truncating division — and far
  friendlier to the TPU compiler than long int8/int32 op chains.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nnue_vision_tpu.formats import QuantizedEtinyNet, QuantizedNNUE


@dataclasses.dataclass(frozen=True)
class NNUESimCfg:
    """Static (hashable) NNUE architecture facts for jit specialization."""

    grid_size: int
    channels: int
    l1: int
    l2: int
    l3: int
    num_classes: int
    conv_scale: int
    fc1_scale: int
    fc2_scale: int
    out_scale: float
    quantized_one: int


@dataclasses.dataclass(frozen=True)
class EtinyBlockCfg:
    stride: int
    s_expand: int
    s_dw: int
    s_project: int
    is_dense: bool


@dataclasses.dataclass(frozen=True)
class EtinySimCfg:
    stem_scale: int
    cls_scale: float
    num_classes: int
    blocks: Tuple[EtinyBlockCfg, ...]


def _tdiv(a: jnp.ndarray, b) -> jnp.ndarray:
    """C-style truncating integer division (toward zero), b > 0."""
    q = jnp.abs(a) // b
    return jnp.where(a < 0, -q, q)


def _wrap_i16(a: jnp.ndarray) -> jnp.ndarray:
    """Reduce int32 values mod 2^16 into [-32768, 32767] (int16 wraparound)."""
    return ((a & 0xFFFF) ^ 0x8000) - 0x8000


def engine_conv_stride(image_h: int, grid_size: int) -> int:
    """The engine's runtime stride rule: ceil((H-1)/(grid-1)).

    (nnue_engine.cpp:667-675.) This differs from the reference Python model's
    `(H-1)//(grid-1)` — a reference train/infer mismatch we do NOT replicate
    on the training side; both sides here use this engine rule.
    """
    if grid_size <= 0:
        raise ValueError("grid_size must be positive")
    if grid_size == 1:
        return max(1, image_h)
    return max(1, -(-(image_h - 1) // (grid_size - 1)))


def _quantize_input(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    """`static_cast<int32_t>(x * scale)`: f32 multiply, truncate toward zero."""
    return jnp.trunc(img.astype(jnp.float32) * jnp.float32(scale)).astype(jnp.int32)


def _int_conv3x3(
    qin: jnp.ndarray, weight_oihw: jnp.ndarray, bias: jnp.ndarray,
    stride: int, *, bf16: bool = False
) -> jnp.ndarray:
    """Exact integer 3x3 conv, padding=1, NHWC, int32 accumulators.

    Performed in float (integer-valued, exact below 2^24 — conv sums are
    ≤ 27·|qx|·127, far inside) so XLA lowers it onto the MXU/conv unit
    instead of a slow integer fallback. bf16=True feeds the MXU in
    bfloat16 (~3x faster conv on a v5e), bit-exact whenever every
    |quantized input| ≤ 256 (products of two bf16-exact integers are
    exact in the MXU's f32 accumulation tree; int8 weights always
    qualify). The flag is STATIC — callers assert the precondition with
    `conv_inputs_bf16_safe` on host data (evaluate does) or by pipeline
    construction (normalized images at scale 64 give |qx| ≤ ~192). A
    runtime lax.cond guard was measured SLOWER than the f32 conv it
    replaced (the max-reduction + cond boundary break XLA fusion).
    """
    dt = jnp.bfloat16 if bf16 else jnp.float32
    rhs = jnp.transpose(weight_oihw, (2, 3, 1, 0)).astype(dt)  # HWIO
    acc = jax.lax.conv_general_dilated(
        qin.astype(dt),
        rhs,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return acc.astype(jnp.int32) + bias.astype(jnp.int32)


# integers with |v| <= 256 cast to bfloat16 exactly (8 significand bits
# incl. the implicit one; 257 is the first integer that rounds)
_BF16_EXACT_INT = 256


def conv_inputs_bf16_safe(images, scale) -> bool:
    """Host-side check: is the bf16 conv fast path bit-exact for this data?

    True iff every |trunc(x*scale)| ≤ 256 (the bf16 exact-integer window).
    Production-normalized images are always safe (|qx| ≤ ~192 at scale 64).
    """
    import numpy as np  # local: engine_sim is otherwise jax-only

    m = float(np.max(np.abs(np.asarray(images, dtype=np.float32))))
    return m * float(scale) <= _BF16_EXACT_INT


# ---------------------------------------------------------------------------
# NNUE
# ---------------------------------------------------------------------------


def nnue_sim_params(q: QuantizedNNUE) -> Tuple[Dict, NNUESimCfg]:
    """Device arrays + static config for `nnue_engine_forward`."""
    params = {
        "conv_w": jnp.asarray(q.conv.weight, jnp.int32),
        "conv_b": jnp.asarray(q.conv.bias, jnp.int32),
        "ft_w": jnp.asarray(q.ft.weight, jnp.int32),
        "ft_b": jnp.asarray(q.ft.bias, jnp.int32),
        "fc1_w": jnp.asarray(q.fc1.weight, jnp.int8),
        "fc1_b": jnp.asarray(q.fc1.bias, jnp.int32),
        "fc2_w": jnp.asarray(q.fc2.weight, jnp.int8),
        "fc2_b": jnp.asarray(q.fc2.bias, jnp.int32),
        "out_w": jnp.asarray(q.out.weight, jnp.int8),
        "out_b": jnp.asarray(q.out.bias, jnp.int32),
        "visual_threshold": jnp.float32(q.visual_threshold),
        "num_features_f32": jnp.float32(q.num_features),
    }
    cfg = NNUESimCfg(
        grid_size=q.grid_size,
        channels=q.num_features_per_square,
        l1=q.l1,
        l2=q.l2,
        l3=q.l3,
        num_classes=q.num_classes,
        conv_scale=int(q.conv.scale),
        fc1_scale=int(q.fc1.scale),
        fc2_scale=int(q.fc2.scale),
        out_scale=float(q.out.scale),
        quantized_one=int(q.quantized_one),
    )
    return params, cfg


def _dot_i8(x_i8: jnp.ndarray, w_i8: jnp.ndarray) -> jnp.ndarray:
    """(B, in) int8 × (out, in) int8 → (B, out) int32 on the MXU."""
    return jax.lax.dot_general(
        x_i8,
        w_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_h", "image_w", "conv_mode")
)
def nnue_engine_forward(
    params: Dict, images: jnp.ndarray, *, cfg: NNUESimCfg, image_h: int,
    image_w: int, conv_mode: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bit-exact NNUE int8 inference for a batch.

    Args:
      params, cfg: from `nnue_sim_params`.
      images: (B, H, W, 3) float32, HWC interleaved exactly as the engine
        reads its `.bin` input (nnue_inference.cpp:23-30 reads H·W·3 floats
        and indexes `(h*W + w)*3 + c`).

    Returns:
      (logits (B, num_classes) float32, density (B,) float32,
      active_count (B,) int32) — logits and density are identical to the
      `nnue_inference` CLI's CSV line per image; active_count is the exact
      integer behind density (divide in numpy when 1-ULP-exact density is
      needed, see note above).
    """
    s = cfg
    grid, ch = s.grid_size, s.channels
    stride = engine_conv_stride(image_h, grid)

    # Conv (nnue_engine.cpp:48-157): quantize input, int32 accumulate,
    # truncating /scale, clamp ±127.
    qin = _quantize_input(images, s.conv_scale)
    acc = _int_conv3x3(
        qin, params["conv_w"], params["conv_b"], stride,
        bf16=(conv_mode == "bf16"),
    )
    conv_out = jnp.clip(_tdiv(acc, s.conv_scale), -127, 127)  # (B,oh,ow,C)

    # Flat placement into the zero-filled grid²·C buffer, then reinterpret
    # with grid-sized rows (nnue_engine.cpp:679-683, nnue_engine.h:236-253).
    b = conv_out.shape[0]
    flat = conv_out.reshape(b, -1)
    num_features = grid * grid * ch
    pad = num_features - flat.shape[1]
    if pad < 0:
        raise ValueError("conv output exceeds feature grid — invalid config")
    buf = jnp.pad(flat, ((0, 0), (0, pad)))

    # Active-feature mask: float compare value > threshold (nnue_engine.h:246).
    mask = buf.astype(jnp.float32) > params["visual_threshold"]  # (B, F)
    # The engine derives density with one f32 division
    # (nnue_inference.cpp:54); XLA's f32 divide is reciprocal-refined and
    # can be 1 ULP off for non-power-of-two divisors, so we also return the
    # integer count — hosts needing exact density divide it in numpy.
    active_count = mask.sum(axis=1).astype(jnp.int32)
    density = active_count.astype(jnp.float32) / params["num_features_f32"]

    # Feature transformer: int16 accumulator with wraparound
    # (simd_scalar.cpp:78-95). Sum in f32 (exact: ≤ F·127 + |bias| < 2^24),
    # then reduce mod 2^16.
    ft = mask.astype(jnp.float32) @ params["ft_w"].astype(jnp.float32)
    ft = ft.astype(jnp.int32) + params["ft_b"]
    ft = _wrap_i16(ft)

    # Clipped ReLU to [0, quantized_one] (nnue_engine.cpp:726-729).
    ft = jnp.clip(ft, 0, s.quantized_one)

    # Pairwise interaction (nnue_engine.cpp:491-500).
    half = s.l1 // 2
    a, bb = ft[:, :half], ft[:, half:]
    prod = jnp.clip(_tdiv(a * bb, 128), 0, 127)
    pairwise = jnp.concatenate([prod, jnp.clip(a, 0, 127)], axis=1)

    # Dense 1 (nnue_engine.cpp:503-509): /l1_scale truncating, clamp [0,127].
    h1 = _dot_i8(pairwise.astype(jnp.int8), params["fc1_w"]) + params["fc1_b"]
    h1 = jnp.clip(_tdiv(h1, s.fc1_scale), 0, 127)

    # Dense 2 (nnue_engine.cpp:512-523): clamp ±127 then ReLU.
    h2 = _dot_i8(h1.astype(jnp.int8), params["fc2_w"]) + params["fc2_b"]
    h2 = jnp.maximum(jnp.clip(_tdiv(h2, s.fc2_scale), -127, 127), 0)

    # Output (nnue_engine.cpp:526-533): float logits acc/output_scale.
    # Exact for power-of-two scales (the only value either serializer
    # emits is 64); see density note above for the general case.
    out = _dot_i8(h2.astype(jnp.int8), params["out_w"]) + params["out_b"]
    logits = out.astype(jnp.float32) / jnp.float32(s.out_scale)
    return logits, density, active_count


# ---------------------------------------------------------------------------
# EtinyNet
# ---------------------------------------------------------------------------


def _check_pow2(scale: float, what: str) -> int:
    """The TPU path divides integer-valued f32 by the scale; truncation is
    exact only for power-of-two scales. Both serializers (ours and the
    reference) only ever emit powers of two (64, and 4 for the amplifier
    block)."""
    s = int(scale)
    if s <= 0 or (s & (s - 1)) != 0:
        raise ValueError(f"{what} scale {scale} is not a power of two; "
                         "the bit-exact TPU fast path requires pow2 scales")
    return s


def etiny_sim_params(q: QuantizedEtinyNet) -> Tuple[Dict, EtinySimCfg]:
    """Device arrays + static config for `etiny_engine_forward`.

    Weights are stored pre-transposed in the layouts the forward consumes
    (HWIO convs, (in, out) matmuls) as integer-valued float32: the whole
    graph then runs in f32 — exact within the engine's value bounds (see
    `etiny_engine_forward`) and far friendlier to the TPU compiler than a
    long int8/int32 chain (which Mosaic takes tens of minutes to compile).
    """
    blocks = []
    block_cfgs = []
    for blk in q.blocks:
        mid = blk.mid_channels
        blocks.append(
            {
                "pw_expand_w": jnp.asarray(blk.pw_expand.T, jnp.float32),
                "pw_expand_b": jnp.asarray(blk.pw_expand_bias, jnp.float32),
                "dw_w": jnp.asarray(
                    blk.dw.transpose(1, 2, 0).reshape(3, 3, 1, mid), jnp.float32
                ),
                "pw_project_w": jnp.asarray(blk.pw_project.T, jnp.float32),
            }
        )
        block_cfgs.append(
            EtinyBlockCfg(
                stride=int(blk.stride),
                s_expand=_check_pow2(blk.pw_expand_scale, "pw_expand"),
                s_dw=_check_pow2(blk.dw_scale, "dw"),
                s_project=_check_pow2(blk.pw_project_scale, "pw_project"),
                is_dense=bool(blk.is_dense),
            )
        )
    params = {
        "stem_w": jnp.asarray(
            q.stem.weight.transpose(2, 3, 1, 0), jnp.float32  # HWIO
        ),
        "stem_b": jnp.asarray(q.stem.bias, jnp.float32),
        "blocks": blocks,
        "cls_w": jnp.asarray(q.classifier.weight, jnp.int8),
        "cls_b": jnp.asarray(q.classifier.bias, jnp.int32),
    }
    cfg = EtinySimCfg(
        stem_scale=_check_pow2(q.stem.scale, "stem"),
        cls_scale=float(q.classifier.scale),
        num_classes=q.num_classes,
        blocks=tuple(block_cfgs),
    )
    return params, cfg


def _tdiv_f32(a: jnp.ndarray, s: int) -> jnp.ndarray:
    """Truncating division of integer-valued f32 by a power-of-two scale.

    a/s is exact in binary floating point for pow2 s, so trunc(a/s) equals
    C integer division toward zero on the underlying integers.
    """
    return jnp.trunc(a / jnp.float32(s))


# ---------------------------------------------------------------------------
# NNUE incremental accumulators (chess-style, batched on TPU)
# ---------------------------------------------------------------------------


@jax.jit
def nnue_accumulator_refresh(params: Dict, mask: jnp.ndarray) -> jnp.ndarray:
    """Full accumulator refresh: bias + maskᵀ rows of the FT table.

    mask: (B, F) {0,1}. Returns int32 accumulators (B, L1) carrying the
    engine's int16 value pre-wraparound (the head applies the wrap), so
    incremental adds/removes stay exact linear updates.
    """
    acc = mask.astype(jnp.float32) @ params["ft_w"].astype(jnp.float32)
    return acc.astype(jnp.int32) + params["ft_b"]


@jax.jit
def nnue_accumulator_update(
    params: Dict, acc: jnp.ndarray, new_mask: jnp.ndarray, old_mask: jnp.ndarray
) -> jnp.ndarray:
    """Chess-style incremental update, batched: one matmul on the CHANGED
    features only (the delta mask is ±1/0), exactly equal to a refresh with
    `new_mask` (nnue_engine.cpp:257-267 upstream semantics).

    For video streams where few grid cells change per frame the delta mask
    is sparse; the MXU still processes it as a dense (B, F) × (F, L1)
    product, which at these sizes is faster than any gather.
    """
    delta = new_mask.astype(jnp.float32) - old_mask.astype(jnp.float32)
    upd = delta @ params["ft_w"].astype(jnp.float32)
    return acc + upd.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def nnue_head_from_accumulator(
    params: Dict, acc: jnp.ndarray, *, cfg: NNUESimCfg
) -> jnp.ndarray:
    """Accumulator (B, L1) int32 → logits, bit-exact engine head
    (int16 wrap → clipped ReLU → pairwise → dense stack)."""
    s = cfg
    ft = jnp.clip(_wrap_i16(acc), 0, s.quantized_one)
    half = s.l1 // 2
    a, bb = ft[:, :half], ft[:, half:]
    prod = jnp.clip(_tdiv(a * bb, 128), 0, 127)
    pairwise = jnp.concatenate([prod, jnp.clip(a, 0, 127)], axis=1)
    h1 = _dot_i8(pairwise.astype(jnp.int8), params["fc1_w"]) + params["fc1_b"]
    h1 = jnp.clip(_tdiv(h1, s.fc1_scale), 0, 127)
    h2 = _dot_i8(h1.astype(jnp.int8), params["fc2_w"]) + params["fc2_b"]
    h2 = jnp.maximum(jnp.clip(_tdiv(h2, s.fc2_scale), -127, 127), 0)
    out = _dot_i8(h2.astype(jnp.int8), params["out_w"]) + params["out_b"]
    return out.astype(jnp.float32) / jnp.float32(s.out_scale)


@functools.partial(jax.jit, static_argnames=("cfg", "image_h", "image_w"))
def nnue_feature_mask(
    params: Dict, images: jnp.ndarray, *, cfg: NNUESimCfg, image_h: int, image_w: int
) -> jnp.ndarray:
    """images → binary active-feature mask (B, F), engine-exact
    (conv frontend + grid placement + threshold)."""
    stride = engine_conv_stride(image_h, cfg.grid_size)
    qin = _quantize_input(images, cfg.conv_scale)
    acc = _int_conv3x3(qin, params["conv_w"], params["conv_b"], stride)
    conv_out = jnp.clip(_tdiv(acc, cfg.conv_scale), -127, 127)
    flat = conv_out.reshape(conv_out.shape[0], -1)
    num_features = cfg.grid_size * cfg.grid_size * cfg.channels
    buf = jnp.pad(flat, ((0, 0), (0, num_features - flat.shape[1])))
    return (buf.astype(jnp.float32) > params["visual_threshold"]).astype(
        jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "image_h", "image_w", "conv_mode")
)
def etiny_engine_forward(
    params: Dict, images: jnp.ndarray, *, cfg: EtinySimCfg, image_h: int,
    image_w: int, conv_mode: str = "f32",
) -> jnp.ndarray:
    """Bit-exact EtinyNet int8 inference for a batch.

    Mirrors EtinyNetEvaluator::evaluate (nnue_engine.cpp:1318-1419): stem
    conv on the raw float image (stride 2), LB/DLB chain (the engine never
    enables the DLB skip path — nnue_engine.cpp:977-982 — so DLB ≡ LB),
    truncating-division requantization with ReLU6 as clamp[0,6]
    (nnue_engine.cpp:906-973), int global average pool (:1452-1463), float
    classifier output (:1028-1040).

    All arithmetic runs in integer-valued float32, exact because every
    accumulator stays below 2^24: pw-expand |acc| ≤ 127·127·in_c (in_c ≤
    256) + bias; depthwise |acc| ≤ 9·6·127; pw-project |acc| ≤ 6·127·mid
    (mid ≤ 1280); divisions are by power-of-two scales. Only the classifier
    (whose accumulator can approach 2^24) uses an int8×int8→int32 MXU dot.

    Returns logits (B, num_classes) float32, identical to the
    `etinynet_inference` CLI's RESULT_i lines.
    """
    s = cfg

    # Stem conv — raw float input, engine-fixed stride 2 (cpp:1341-1351).
    # Same opt-in bf16 fast path as _int_conv3x3 (static flag; exact
    # while every |quantized input| ≤ 256 — see conv_inputs_bf16_safe).
    qin = jnp.trunc(images.astype(jnp.float32) * jnp.float32(s.stem_scale))
    dt = jnp.bfloat16 if conv_mode == "bf16" else jnp.float32
    acc = jax.lax.conv_general_dilated(
        qin.astype(dt), params["stem_w"].astype(dt), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + params["stem_b"]
    x = jnp.clip(_tdiv_f32(acc, s.stem_scale), -127, 127)

    for blk, bs in zip(params["blocks"], s.blocks):
        in_h, in_w = x.shape[1], x.shape[2]
        # pw-expand + ReLU6 (cpp:906-924).
        acc = jax.lax.dot_general(
            x, blk["pw_expand_w"], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + blk["pw_expand_b"]
        h = jnp.clip(_tdiv_f32(acc, bs.s_expand), 0, 6)
        # depthwise 3x3 + ReLU6 (cpp:927-952).
        c = h.shape[3]
        acc = jax.lax.conv_general_dilated(
            h, blk["dw_w"], (bs.stride, bs.stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        h = jnp.clip(_tdiv_f32(acc, bs.s_dw), 0, 6)
        # pw-project, no bias, no activation (cpp:955-973).
        acc = jax.lax.dot_general(
            h, blk["pw_project_w"], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = jnp.clip(_tdiv_f32(acc, bs.s_project), -127, 127)

        if bs.is_dense:
            # Engine quirk, reproduced for bit parity: the evaluator assumes
            # dense blocks preserve spatial dims (nnue_engine.cpp:1381-1397)
            # even when the inner LB has stride 2, so the real (smaller)
            # output lands flat at the front of a zero-filled (in_h, in_w)
            # buffer. Identity when stride == 1. Our own serializer avoids
            # ever hitting the scrambling case by tagging stride-2 dense
            # blocks as plain LB (see models/etinynet.py).
            out_c = x.shape[3]
            flat = x.reshape(x.shape[0], -1)
            pad = in_h * in_w * out_c - flat.shape[1]
            x = jnp.pad(flat, ((0, 0), (0, pad))).reshape(
                x.shape[0], in_h, in_w, out_c
            )

    # Global average pool: int32 sum, truncating int mean, clamp
    # (cpp:1452-1463). hw is not a power of two in general, so the mean
    # uses true integer division.
    hw = x.shape[1] * x.shape[2]
    pooled_sum = x.sum(axis=(1, 2)).astype(jnp.int32)
    pooled = jnp.clip(_tdiv(pooled_sum, hw), -127, 127)

    # Classifier: float output acc/scale (cpp:1028-1040).
    out = _dot_i8(pooled.astype(jnp.int8), params["cls_w"]) + params["cls_b"]
    return out.astype(jnp.float32) / jnp.float32(s.cls_scale)
