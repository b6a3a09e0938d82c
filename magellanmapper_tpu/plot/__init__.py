"""Visualization: colormaps, 2D task plots, figure support."""
