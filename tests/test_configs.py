"""Config system tests: loading, required surface, CLI overrides."""

import argparse
from pathlib import Path

import pytest

from config import ConfigError, get_config_dict, load_config

REPO = Path(__file__).resolve().parent.parent

CONFIG_FILES = [
    "train_nnue_default.py",
    "train_nnue.py",
    "train_nnue_test.py",
    "train_etinynet_default.py",
    "train_etinynet.py",
    "train_etinynet_test.py",
]

COMMON_REQUIRED = [
    "name", "batch_size", "num_classes", "learning_rate", "weight_decay",
    "max_epochs", "subset", "use_augmentation", "augmentation_strength",
    "seed", "keep_alive", "log_dir", "project_name",
]


@pytest.mark.parametrize("filename", CONFIG_FILES)
def test_config_loads_with_required_surface(filename):
    cfg = load_config(str(REPO / "config" / filename))
    for attr in COMMON_REQUIRED:
        assert hasattr(cfg, attr), f"{filename} missing {attr}"
    if "nnue" in filename:
        for attr in ("l1_size", "l2_size", "l3_size", "grid_size",
                     "num_features_per_square", "input_size"):
            assert hasattr(cfg, attr), f"{filename} missing {attr}"
    else:
        assert hasattr(cfg, "etinynet_variant")


def test_config_dict_filters_private_and_modules():
    cfg = load_config(str(REPO / "config" / "train_nnue_test.py"))
    d = get_config_dict(cfg)
    assert "batch_size" in d
    assert not any(k.startswith("_") for k in d)


def test_missing_config_raises():
    with pytest.raises(ConfigError):
        load_config("config/does_not_exist.py")


def test_non_python_config_rejected(tmp_path):
    bad = tmp_path / "config.yaml"
    bad.write_text("a: 1")
    with pytest.raises(ConfigError):
        load_config(str(bad))


def test_broken_config_raises(tmp_path):
    bad = tmp_path / "broken.py"
    bad.write_text("raise RuntimeError('boom')")
    with pytest.raises(ConfigError):
        load_config(str(bad))


def test_cli_overrides():
    import train as train_cli

    parser = train_cli.setup_argument_parser()
    args = parser.parse_args([
        "nnue", "--config", str(REPO / "config" / "train_nnue_test.py"),
        "--batch_size", "16", "--learning_rate", "0.5",
        "--max_epochs", "7", "--use_augmentation", "true",
        "--augmentation_strength", "heavy", "--dataset_name", "cifar100",
    ])
    cfg = train_cli.load_and_setup_config(args, "nnue")
    assert cfg.batch_size == 16
    assert cfg.learning_rate == 0.5
    assert cfg.max_epochs == 7
    assert cfg.use_augmentation is True
    assert cfg.augmentation_strength == "heavy"
    assert cfg.dataset_name == "cifar100"


def test_cli_default_config_path():
    import train as train_cli

    parser = train_cli.setup_argument_parser()
    args = parser.parse_args(["etinynet"])
    cfg = train_cli.load_and_setup_config(args, "etinynet")
    assert cfg.name == "etinynet_default"


def test_cli_rejects_bad_model_type():
    import train as train_cli

    parser = train_cli.setup_argument_parser()
    with pytest.raises(SystemExit):
        parser.parse_args(["resnet"])
