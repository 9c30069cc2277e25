"""Portable tools (L0): timers, stats, generators."""
