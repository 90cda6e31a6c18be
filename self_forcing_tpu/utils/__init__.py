"""Utilities: checkpoints, losses, metrics, profiling, IO."""
