"""Core color / palette / threshold primitives (pure functions, host + device)."""
