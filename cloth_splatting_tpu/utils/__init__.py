"""Utilities: logging, checkpoints, timers, system helpers."""
