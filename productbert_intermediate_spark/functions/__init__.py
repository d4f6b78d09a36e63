"""Scalar / text functions (the engine's function library)."""
