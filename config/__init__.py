"""Executable-Python config system (upstream config/config_loader.py parity)."""

from config.config_loader import ConfigError, get_config_dict, load_config  # noqa: F401
