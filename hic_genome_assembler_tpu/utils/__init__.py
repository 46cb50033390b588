"""Utilities: logging/timers, profiling, synthetic fixtures."""
