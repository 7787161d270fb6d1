"""Benchmark + parity-harness scripts (importable so tests can reuse the
cross-framework helpers in parity_vs_reference.py)."""
