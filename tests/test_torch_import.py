"""Upstream torch checkpoint migration: state dicts with the upstream
module tree load into our pytrees and serialize to engine files."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nnue_vision_tpu.torch_import import (  # noqa: E402
    is_torch_checkpoint,
    load_torch_checkpoint_auto,
    load_torch_nnue,
)


def _upstream_nnue_state_dict(grid=4, ch=4, l1=16, l2=8, l3=4, classes=3):
    g = torch.Generator().manual_seed(0)
    f = grid * grid * ch

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    return {
        "conv.weight": t(ch, 3, 3, 3),
        "visual_threshold": torch.full((ch,), 0.1),
        "input.weight": t(f, l1),
        "input.bias": t(l1),
        "classifier.classifier.0.weight": t(l2, l1),
        "classifier.classifier.0.bias": t(l2),
        "classifier.classifier.2.weight": t(l3, l2),
        "classifier.classifier.2.bias": t(l3),
        "classifier.classifier.4.weight": t(classes, l3),
        "classifier.classifier.4.bias": t(classes),
        "nnue2score": torch.tensor(600.0),
    }


def test_sniff_and_load_nnue(tmp_path):
    sd = _upstream_nnue_state_dict()
    path = tmp_path / "upstream.pt"
    torch.save(sd, path)
    assert is_torch_checkpoint(path)

    params, cfg = load_torch_nnue(path)
    assert cfg.feature_set.grid_size == 4
    assert cfg.feature_set.num_features_per_square == 4
    assert cfg.l1_size == 16 and cfg.num_classes == 3
    np.testing.assert_allclose(params["ft_w"], sd["input.weight"].numpy())
    np.testing.assert_allclose(params["conv_w"], sd["conv.weight"].numpy())


def test_wrapped_checkpoint_and_auto(tmp_path):
    path = tmp_path / "wrapped.ckpt"
    torch.save({"state_dict": _upstream_nnue_state_dict()}, path)
    model_type, params, stats, cfg = load_torch_checkpoint_auto(path)
    assert model_type == "nnue" and stats is None
    assert params["out_w"].shape == (3, 4)


def test_torch_to_engine_file(tmp_path, rng):
    """Full migration: torch checkpoint → serialize.py → engine-evaluable."""
    path = tmp_path / "upstream.pt"
    torch.save(_upstream_nnue_state_dict(), path)

    from serialize import serialize_checkpoint

    out = serialize_checkpoint(path, tmp_path / "migrated.nnue")
    from nnue_vision_tpu.formats import read_nnue
    from nnue_vision_tpu.ops.engine_sim_np import nnue_forward_np

    q = read_nnue(out)
    img = rng.random((16, 16, 3), dtype=np.float32).astype(np.float32)
    logits, _ = nnue_forward_np(q, img)
    assert logits.shape == (3,) and np.all(np.isfinite(logits))


def test_own_checkpoints_not_misdetected(tmp_path):
    import jax

    from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
    from nnue_vision_tpu.training.checkpoint import save_checkpoint

    cfg = NNUEConfig(feature_set=GridFeatureSet(4, 4), l1_size=16, l2_size=8,
                     l3_size=4, num_classes=3, input_size=16)
    path = tmp_path / "ours.ckpt"
    save_checkpoint(path, model_type="nnue", model_config=cfg,
                    params=nnue_init(jax.random.PRNGKey(0), cfg),
                    epoch=0, metrics={})
    assert not is_torch_checkpoint(path)
