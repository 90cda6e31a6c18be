"""Training subsystem: trainers, objectives, optimizers, EMA."""
