"""Pure-numpy bit-exact engine simulation (host-side oracle).

Same integer semantics as `engine_sim.py` (see that module's docstring for
the full arithmetic contract and reference citations) but written in plain
numpy with no JAX dependency. Used by tests as a fast middle oracle between
the JAX TPU path and the C++ engine binaries, and by the serializer CLI to
self-verify written files.

Validated bit-exact against the reference `nnue_inference` /
`etinynet_inference` binaries across architectures (tests/test_engine_parity.py).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from nnue_vision_tpu.formats import QuantizedEtinyNet, QuantizedNNUE


def _tdiv(a: np.ndarray, b: int) -> np.ndarray:
    """C truncating integer division toward zero; b > 0."""
    a = np.asarray(a)
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def _wrap_i16(a: np.ndarray) -> np.ndarray:
    return ((a & 0xFFFF) ^ 0x8000) - 0x8000


def conv_stride_for(image_h: int, grid_size: int) -> int:
    """Engine runtime stride rule ceil((H-1)/(grid-1)) (nnue_engine.cpp:667)."""
    if grid_size == 1:
        return max(1, image_h)
    return max(1, -(-(image_h - 1) // (grid_size - 1)))


def _int_conv3x3_np(
    img: np.ndarray, weight_oihw: np.ndarray, bias: np.ndarray, scale: int, stride: int
) -> np.ndarray:
    """Engine ConvLayer::forward: float input, int32 accumulate, /scale clamp.

    img is (H, W, 3) float32; returns (oh, ow, out_c) int64 in [-127, 127].
    """
    h, w = img.shape[:2]
    out_c = weight_oihw.shape[0]
    oh = (h + 2 - 3) // stride + 1
    ow = (w + 2 - 3) // stride + 1
    qin = np.trunc(img.astype(np.float32) * np.float32(scale)).astype(np.int64)
    qpad = np.zeros((h + 2, w + 2, 3), np.int64)
    qpad[1 : h + 1, 1 : w + 1] = qin
    wgt = weight_oihw.astype(np.int64)
    acc = np.zeros((oh, ow, out_c), np.int64) + bias.astype(np.int64)
    for kh in range(3):
        for kw in range(3):
            patch = qpad[kh : kh + (oh - 1) * stride + 1 : stride,
                         kw : kw + (ow - 1) * stride + 1 : stride]
            # (oh, ow, 3) x (out_c, 3) summed over input channels
            acc += patch @ wgt[:, :, kh, kw].T
    return np.clip(_tdiv(acc, scale), -127, 127)


def nnue_forward_np(
    q: QuantizedNNUE, img: np.ndarray
) -> Tuple[np.ndarray, float]:
    """Single-image NNUE int8 inference; bit-exact vs `nnue_inference` CLI."""
    h, w = img.shape[:2]
    grid, ch = q.grid_size, q.num_features_per_square
    stride = conv_stride_for(h, grid)
    conv_out = _int_conv3x3_np(img, q.conv.weight, q.conv.bias, int(q.conv.scale), stride)

    buf = np.zeros(grid * grid * ch, np.int64)
    flat = conv_out.reshape(-1)
    buf[: flat.size] = flat
    mask = buf.astype(np.float32) > np.float32(q.visual_threshold)
    # density is one f32 division in the engine (nnue_inference.cpp:54)
    density = float(np.float32(mask.sum()) / np.float32(q.num_features))

    ft = q.ft.bias.astype(np.int64) + mask.astype(np.int64) @ q.ft.weight.astype(np.int64)
    ft = np.clip(_wrap_i16(ft), 0, int(q.quantized_one))

    half = q.l1 // 2
    a, b = ft[:half], ft[half:]
    pairwise = np.concatenate(
        [np.clip(_tdiv(a * b, 128), 0, 127), np.clip(a, 0, 127)]
    )

    h1 = np.clip(
        _tdiv(q.fc1.bias.astype(np.int64) + q.fc1.weight.astype(np.int64) @ pairwise,
              int(q.fc1.scale)),
        0, 127,
    )
    h2 = np.maximum(
        np.clip(
            _tdiv(q.fc2.bias.astype(np.int64) + q.fc2.weight.astype(np.int64) @ h1,
                  int(q.fc2.scale)),
            -127, 127,
        ),
        0,
    )
    acc = q.out.bias.astype(np.int64) + q.out.weight.astype(np.int64) @ h2
    logits = acc.astype(np.float32) / np.float32(q.out.scale)
    return logits, density


def etiny_forward_np(q: QuantizedEtinyNet, img: np.ndarray) -> np.ndarray:
    """Single-image EtinyNet int8 inference; bit-exact vs `etinynet_inference`."""
    x = _int_conv3x3_np(img, q.stem.weight, q.stem.bias, int(q.stem.scale), stride=2)

    for blk in q.blocks:
        h, w = x.shape[:2]
        mid = blk.mid_channels
        # pw-expand + ReLU6
        acc = blk.pw_expand_bias.astype(np.int64) + x @ blk.pw_expand.astype(np.int64).T
        hb = np.clip(_tdiv(acc, int(blk.pw_expand_scale)), 0, 6)
        # depthwise 3x3, padding 1, per-channel
        s = blk.stride
        oh = (h - 3 + 2) // s + 1
        ow = (w - 3 + 2) // s + 1
        pad = np.zeros((h + 2, w + 2, mid), np.int64)
        pad[1 : h + 1, 1 : w + 1] = hb
        acc = np.zeros((oh, ow, mid), np.int64)
        dw = blk.dw.astype(np.int64)
        for kh in range(3):
            for kw in range(3):
                patch = pad[kh : kh + (oh - 1) * s + 1 : s,
                            kw : kw + (ow - 1) * s + 1 : s]
                acc += patch * dw[:, kh, kw]
        hb = np.clip(_tdiv(acc, int(blk.dw_scale)), 0, 6)
        # pw-project (no bias, no activation)
        acc = hb @ blk.pw_project.astype(np.int64).T
        x = np.clip(_tdiv(acc, int(blk.pw_project_scale)), -127, 127)

        if blk.is_dense:
            # Engine quirk (nnue_engine.cpp:1381-1397): dense blocks are
            # assumed spatial-dim-preserving; real output is flat-placed in
            # a zero (in_h, in_w, C) buffer. Identity for stride 1.
            out_c = x.shape[2]
            buf = np.zeros(h * w * out_c, np.int64)
            buf[: x.size] = x.reshape(-1)
            x = buf.reshape(h, w, out_c)

    hw = x.shape[0] * x.shape[1]
    pooled = np.clip(_tdiv(x.sum(axis=(0, 1)), hw), -127, 127)
    acc = q.classifier.bias.astype(np.int64) + q.classifier.weight.astype(np.int64) @ pooled
    return acc.astype(np.float32) / np.float32(q.classifier.scale)
