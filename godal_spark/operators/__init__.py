"""DataFrame-level operators (the engine's physical stages)."""
