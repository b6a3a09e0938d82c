"""Tile stitching: TPU FFT phase correlation + global optimization."""
