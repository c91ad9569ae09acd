"""Import upstream torch checkpoints into this framework's param pytrees.

Migration path for reference-NNUE-Vision users: their `.pt`/`.ckpt` torch
checkpoints (state dicts with keys like `conv.weight`, `input.weight`,
`classifier.classifier.0.weight` — upstream nnue.py module tree) load
directly into our numpy pytrees, after which training, serialization, and
int8 deployment all work unchanged. Requires torch only when actually
called (it is an optional dependency).

Architecture inference mirrors upstream
infer_architecture_from_state_dict (serialize.py:715-788).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np


def _to_numpy_state_dict(path: Path) -> Dict[str, np.ndarray]:
    import torch  # optional dependency, imported lazily

    checkpoint = torch.load(path, map_location="cpu", weights_only=True)
    state = checkpoint.get("state_dict", checkpoint)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def is_torch_checkpoint(path: Path) -> bool:
    """Cheap sniff: torch zip-serialized files start with PK."""
    with open(path, "rb") as f:
        head = f.read(4)
    return head[:2] == b"PK" or head == b"\x80\x02"


def load_torch_nnue(path: Path):
    """torch NNUE state dict → (params pytree, NNUEConfig)."""
    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig

    sd = _to_numpy_state_dict(path)
    if "input.weight" not in sd:
        raise ValueError(
            "not an upstream NNUE state dict (missing input.weight); "
            f"keys: {sorted(sd)[:8]}"
        )
    num_features, l1 = sd["input.weight"].shape
    ch = sd["conv.weight"].shape[0]
    grid = int(round((num_features / ch) ** 0.5))
    if grid * grid * ch != num_features:
        raise ValueError(
            f"cannot infer grid from {num_features} features / {ch} channels"
        )
    l2 = sd["classifier.classifier.0.weight"].shape[0]
    l3 = sd["classifier.classifier.2.weight"].shape[0]
    num_classes = sd["classifier.classifier.4.weight"].shape[0]

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(grid, ch),
        l1_size=int(l1), l2_size=int(l2), l3_size=int(l3),
        num_classes=int(num_classes),
    )
    params = {
        "conv_w": sd["conv.weight"].astype(np.float32),  # OIHW both sides
        "visual_threshold": sd["visual_threshold"].astype(np.float32).reshape(-1),
        "ft_w": sd["input.weight"].astype(np.float32),
        "ft_b": sd["input.bias"].astype(np.float32),
        "fc1_w": sd["classifier.classifier.0.weight"].astype(np.float32),
        "fc1_b": sd["classifier.classifier.0.bias"].astype(np.float32),
        "fc2_w": sd["classifier.classifier.2.weight"].astype(np.float32),
        "fc2_b": sd["classifier.classifier.2.bias"].astype(np.float32),
        "out_w": sd["classifier.classifier.4.weight"].astype(np.float32),
        "out_b": sd["classifier.classifier.4.bias"].astype(np.float32),
        "nnue2score": np.float32(sd.get("nnue2score", np.float32(600.0))),
    }
    return params, cfg


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": sd[f"{prefix}.weight"].astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _bn_stats(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "mean": sd[f"{prefix}.running_mean"].astype(np.float32),
        "var": sd[f"{prefix}.running_var"].astype(np.float32),
    }


def load_torch_etinynet(path: Path):
    """torch EtinyNet state dict → (params, batch_stats, EtinyNetConfig).

    Variant is inferred from the stem width (upstream
    infer_etinynet_variant_from_state_dict, serialize.py:674-691).
    """
    from nnue_vision_tpu.models.etinynet import EtinyNetConfig

    sd = _to_numpy_state_dict(path)
    if "conv_initial.weight" not in sd:
        raise ValueError("not an upstream EtinyNet state dict")
    stem_out = sd["conv_initial.weight"].shape[0]
    variant = {32: "1.0", 28: "0.98M", 24: "0.75", 8: "micro"}.get(stem_out)
    if variant is None:
        raise ValueError(f"unknown stem width {stem_out}")
    num_classes = sd["classifier.weight"].shape[0]
    cfg = EtinyNetConfig(variant=variant, num_classes=int(num_classes),
                         input_size=32)

    def conv_hwio(key):  # torch OIHW → our HWIO
        return np.transpose(sd[key], (2, 3, 1, 0)).astype(np.float32)

    def dw_hwio(key):  # torch (C,1,3,3) → (3,3,1,C)
        return np.transpose(sd[key], (2, 3, 1, 0)).astype(np.float32)

    params = {
        "stem_w": conv_hwio("conv_initial.weight"),
        "stem_bn": _bn(sd, "bn_initial"),
        "blocks": [],
        "final_w": conv_hwio("conv_final.weight"),
        "final_bn": _bn(sd, "bn_final"),
        "cls_w": sd["classifier.weight"].astype(np.float32),
        "cls_b": sd["classifier.bias"].astype(np.float32),
    }
    stats = {
        "stem_bn": _bn_stats(sd, "bn_initial"),
        "blocks": [],
        "final_bn": _bn_stats(sd, "bn_final"),
    }

    specs = cfg.block_specs()
    # upstream module paths: stage{1..4}.{i}.<lb.>pw_expand etc.
    stage_lengths = [len(cfg.table[f"stage{k}"]) for k in range(1, 5)]
    idx_in_stage, stage_no = 0, 1
    for spec_i, (kind, in_c, mid, out, stride, dense) in enumerate(specs):
        base = f"stage{stage_no}.{idx_in_stage}"
        inner = f"{base}.lb" if dense else base
        bp = {
            "pw_expand_w": conv_hwio(f"{inner}.pw_expand.weight"),
            "bn1": _bn(sd, f"{inner}.bn1"),
            "dw_w": dw_hwio(f"{inner}.dw_conv.weight"),
            "bn2": _bn(sd, f"{inner}.bn2"),
            "pw_project_w": conv_hwio(f"{inner}.pw_project.weight"),
            "bn3": _bn(sd, f"{inner}.bn3"),
        }
        bs = {
            "bn1": _bn_stats(sd, f"{inner}.bn1"),
            "bn2": _bn_stats(sd, f"{inner}.bn2"),
            "bn3": _bn_stats(sd, f"{inner}.bn3"),
        }
        if dense and stride == 1 and in_c == out:
            bp["dense_proj_w"] = conv_hwio(f"{base}.dense_proj.weight")
            bp["dense_bn"] = _bn(sd, f"{base}.dense_bn")
            bs["dense_bn"] = _bn_stats(sd, f"{base}.dense_bn")
        params["blocks"].append(bp)
        stats["blocks"].append(bs)
        idx_in_stage += 1
        if idx_in_stage >= stage_lengths[stage_no - 1]:
            stage_no += 1
            idx_in_stage = 0
    return params, stats, cfg


def load_torch_checkpoint_auto(path: Path) -> Tuple[str, dict, object, object]:
    """(model_type, params, batch_stats, cfg) from an upstream checkpoint."""
    sd = _to_numpy_state_dict(path)
    if "input.weight" in sd or any("layer_stacks" in k for k in sd):
        params, cfg = load_torch_nnue(path)
        return "nnue", params, None, cfg
    if "conv_initial.weight" in sd or any(k.startswith("stage") for k in sd):
        params, stats, cfg = load_torch_etinynet(path)
        return "etinynet", params, stats, cfg
    raise ValueError(f"unrecognized torch checkpoint: {sorted(sd)[:8]}")
