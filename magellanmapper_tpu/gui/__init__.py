"""Headless review tooling.

The reference's GUI (``magmap/gui/``, 9.5k LoC TraitsUI/Qt + Mayavi) is
an interactive desktop app off the compute/metric path (SURVEY.md §7
"GUI optional — keep CLI/API parity first"). This package provides the
GUI's *data workflows* headlessly: ROI plane grids with blob overlays
(ROI Editor's core view), blob confirmation round trips to the database,
and verification match review exports.
"""
