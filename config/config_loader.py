"""Load plain-Python config files as modules.

Interface parity with upstream config/config_loader.py:16-71: a config is
an arbitrary `.py` file of module-level variables, exec'd and returned as
a module object; `get_config_dict` filters out dunders and modules.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path
from types import ModuleType
from typing import Any, Dict


class ConfigError(Exception):
    """Configuration loading failure."""


def load_config(config_path: str) -> ModuleType:
    path = Path(config_path)
    if not path.exists():
        raise ConfigError(f"Configuration file not found: {path}")
    if path.suffix != ".py":
        raise ConfigError(f"Configuration file must be a .py file: {path}")
    try:
        spec = importlib.util.spec_from_file_location("config_module", path)
        if spec is None or spec.loader is None:
            raise ConfigError(f"Cannot create module spec for {path}")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    except ConfigError:
        raise
    except Exception as e:
        raise ConfigError(f"Failed to load configuration from {path}: {e}")


def get_config_dict(config_module: ModuleType) -> Dict[str, Any]:
    return {
        name: getattr(config_module, name)
        for name in dir(config_module)
        if not name.startswith("_")
        and not isinstance(getattr(config_module, name), ModuleType)
    }
