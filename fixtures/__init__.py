"""Deterministic synthetic test corpora (no RNG, no external data)."""
