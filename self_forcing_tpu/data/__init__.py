"""Data layer: native record store, datasets, loader."""
