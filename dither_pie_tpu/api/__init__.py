"""Public API layer: ImageDitherer facade, strategies, config system."""
