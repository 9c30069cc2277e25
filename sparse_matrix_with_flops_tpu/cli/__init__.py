"""Command-line drivers and analysis tools (L5)."""
