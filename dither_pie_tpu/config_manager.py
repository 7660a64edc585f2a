"""Compatibility alias for the reference's ``config_manager`` module."""

from dither_pie_tpu.api.config_manager import ConfigManager  # noqa: F401
