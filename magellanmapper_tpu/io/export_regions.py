"""Region exports: ontology CSVs, density/heat images, metric painting.

Equivalent of ``magmap/io/export_regions.py``: ``export_region_ids :33``,
``export_region_network :132``, ``make_density_image :210`` (blob heat
map registered to atlas space), ``map_metric_to_labels_img :443``,
``make_labels_level_img :519``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from magellanmapper_tpu.atlas import ontology
from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import cv_nd
from magellanmapper_tpu.io import np_io, sitk_io
from magellanmapper_tpu.utils import libmag

_logger = logging.getLogger(__name__)


def export_region_ids(
        labels_ref: ontology.LabelsRef, path: str,
        level: Optional[int] = None) -> pd.DataFrame:
    """Export the ontology hierarchy to CSV
    (reference ``export_region_ids :33``)."""
    df = labels_ref.get_ref_lookup_as_df()
    if level is not None:
        df = df[[lvl is None or lvl <= level for lvl in df["Level"]]]
    df = df.drop(columns=["ParentIDs"], errors="ignore")
    df.to_csv(path, index=False)
    return df


def export_region_network(
        labels_ref: ontology.LabelsRef, path: str) -> pd.DataFrame:
    """Export parent-child edges as a SIF-style graph
    (reference ``export_region_network :132``)."""
    rows = []
    for lid, entry in labels_ref.ref_lookup.items():
        parents = entry[ontology.PARENT_IDS]
        if parents:
            rows.append({
                "source": parents[-1], "interaction": "pp",
                "target": lid})
    df = pd.DataFrame(rows)
    df.to_csv(path, sep="\t", index=False, header=False)
    return df


def make_density_image(
        img_path: str,
        scale: Optional[float] = None,
        shape: Optional[Sequence[int]] = None,
        suffix: Optional[str] = None,
        blobs: Optional[blobs_mod.Blobs] = None,
        channel: Optional[Sequence[int]] = None
) -> Tuple[np.ndarray, str]:
    """Build a blob heat map in registered (atlas) space
    (reference ``make_density_image :210``).

    Scales blob coordinates into the registered image's shape and counts
    per voxel; writes ``<base>_heat.mhd``.
    """
    if blobs is None:
        blobs = blobs_mod.Blobs().load_blobs(
            libmag.combine_paths(img_path, "blobs.npz"))
    arr = blobs.blobs
    if channel is not None:
        arr = blobs_mod.Blobs.blobs_in_channel(arr, channel)

    # target shape: registered atlas if present, else scaled main image
    target_shape = shape
    spacing = (1.0, 1.0, 1.0)
    if target_shape is None:
        try:
            med = sitk_io.read_med_img(sitk_io.find_sitk_file(
                sitk_io.reg_out_path(img_path, "atlasVolume.mhd")))
            target_shape = med.img.shape
            spacing = med.spacing
        except (FileNotFoundError, ValueError):
            pass
    img5d = None
    if target_shape is None or scale is not None:
        img5d = np_io.read_file(img_path)
    if target_shape is None:
        factor = scale or 1.0
        target_shape = tuple(
            int(s * factor) for s in img5d.img.shape[1:4])

    if img5d is None:
        img5d = np_io.read_file(img_path)
    scaling = np_io.find_scaling(img5d.img.shape[1:4], target_shape)
    coords = ontology.scale_coords(arr[:, :3], scaling, target_shape)
    heat = cv_nd.build_heat_map(target_shape, coords)
    out_path = sitk_io.reg_out_path(img_path, "heat.mhd")
    sitk_io.write_med_img(out_path, sitk_io.MedImage(
        heat.astype(np.int32), spacing))
    _logger.info("wrote density image %s (%d blobs)", out_path, len(arr))
    return heat, out_path


def map_metric_to_labels_img(
        labels_img: np.ndarray, df: pd.DataFrame, metric: str,
        out_path: Optional[str] = None) -> np.ndarray:
    """Paint a metric into the labels image and optionally save
    (reference ``map_metric_to_labels_img :443``)."""
    from magellanmapper_tpu.stats import vols
    out = vols.map_meas_to_labels(labels_img, df, metric)
    if out_path:
        sitk_io.write_med_img(out_path, sitk_io.MedImage(
            out.astype(np.float32)))
    return out


def make_labels_level_img(
        labels_img: np.ndarray, labels_ref: ontology.LabelsRef,
        level: int, out_path: Optional[str] = None) -> np.ndarray:
    """Remap labels to an ontology level and optionally save
    (reference ``make_labels_level_img :519``)."""
    out = ontology.make_labels_level(
        labels_img, labels_ref.ref_lookup, level)
    if out_path:
        sitk_io.write_med_img(out_path, sitk_io.MedImage(
            out.astype(np.int32)))
    return out


def export_common_labels(
        img_paths, out_path: Optional[str] = None) -> pd.DataFrame:
    """Labels present in every sample's annotation image
    (reference ``config.PATH_COMMON_LABELS`` flow)."""
    common = None
    per_sample = {}
    for path in img_paths:
        labels = sitk_io.load_registered_img(path, "annotation.mhd")
        ids = set(int(i) for i in np.unique(labels) if i != 0)
        per_sample[os.path.basename(path)] = ids
        common = ids if common is None else (common & ids)
    df = pd.DataFrame({"Region": sorted(common or [])})
    if out_path:
        df.to_csv(out_path, index=False)
    _logger.info("%d labels common across %d samples",
                 len(df), len(img_paths))
    return df


def make_density_images_mp(
        img_paths: Sequence[str], scale: Optional[float] = None,
        shape: Optional[Sequence[int]] = None,
        suffix: Optional[str] = None,
        channel: Optional[Sequence[int]] = None) -> list:
    """Density images for a batch of samples
    (reference ``export_regions.make_density_images_mp :~390``). The
    reference fans samples across processes; heat-map binning here is a
    single vectorized pass per sample, so they just run in sequence.
    """
    out = []
    for path in img_paths:
        try:
            out.append(make_density_image(
                path, scale=scale, shape=shape, suffix=suffix,
                channel=channel))
        except (FileNotFoundError, ValueError) as exc:
            _logger.warning("density image failed for %s: %s", path, exc)
    return out
