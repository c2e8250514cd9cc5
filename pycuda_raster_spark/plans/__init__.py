"""Composed query plans: the flagship resumable raster pipeline."""
