"""Standalone helper tools (reference surface: /root/reference/misc/)."""
