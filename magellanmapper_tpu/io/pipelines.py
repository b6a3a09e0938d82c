"""End-to-end pipeline orchestration (reference ``bin/pipelines.sh``).

The reference's server pipeline (``pipelines.sh:69``: download -> stitch
-> import -> transpose/rescale -> detect -> compress/upload -> notify)
as a Python driver with artifact-level resume: stages whose outputs
already exist are skipped (``pipelines.sh get_image_files`` semantics).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

_logger = logging.getLogger(__name__)

PIPELINES = ("full", "detection", "transformation", "stitching",
             "import", "download")


def run_pipeline(
        pipeline: str,
        img_path: str,
        roi_profile=None,
        resolutions: Optional[Sequence[float]] = None,
        rescale: Optional[float] = None,
        tile_grid: Optional[Dict] = None,
        s3_bucket: Optional[str] = None,
        notify_url: Optional[str] = None,
        channels: Optional[Sequence[int]] = None) -> Dict[str, str]:
    """Run a named pipeline over an image, resuming from existing
    artifacts.

    Returns a dict of stage -> output path for the stages that ran.
    """
    from magellanmapper_tpu.io import np_io
    from magellanmapper_tpu.settings.roi_prof import ROIProfile

    if pipeline not in PIPELINES:
        raise ValueError(
            f"unknown pipeline {pipeline}; options: {PIPELINES}")
    if roi_profile is None:
        roi_profile = ROIProfile()
    outputs: Dict[str, str] = {}

    if pipeline in ("download", "full") and s3_bucket:
        from magellanmapper_tpu.cloud import aws
        if not os.path.exists(img_path):
            outputs["download"] = aws.download_s3(
                s3_bucket, os.path.basename(img_path), img_path)

    if pipeline in ("stitching", "full") and tile_grid:
        from magellanmapper_tpu.io import importer, tiff
        from magellanmapper_tpu.stitch import stitcher
        fused_path = os.path.splitext(img_path)[0] + "_fused.npy"
        if not os.path.exists(
                np_io.make_filenames(fused_path)[0]):
            if tile_grid.get("mesospim"):
                # mesoSPIM RAW tiles -> BigStitcher-style TIFs first
                # (reference stitch/mesospim_to_tif.py pre-stitch stage)
                from magellanmapper_tpu.stitch import acquisition
                acquisition.mesospim_to_tif(tile_grid["dir"])
            files = importer.setup_import_dir(tile_grid["dir"])
            tiles = [tiff.read_tiff(f) for f in files]
            grid = stitcher.TileGrid(
                tile_grid["rows"], tile_grid["cols"], tiles[0].shape,
                tile_grid.get("overlap", 0.1))
            fused, _ = stitcher.stitch(tiles, grid)
            np_io.write_npy(fused_path, fused[None],
                            resolutions=(
                                [list(resolutions)] if resolutions
                                else None))
            outputs["stitching"] = fused_path
            img_path = fused_path

    if pipeline in ("import", "detection", "transformation", "full"):
        path_img, _ = np_io.make_filenames(img_path)
        if not os.path.exists(path_img) and img_path.lower().endswith(
                (".tif", ".tiff")):
            from magellanmapper_tpu.io import importer
            importer.import_tiff(img_path, resolutions=resolutions)
            outputs["import"] = path_img

    if pipeline in ("transformation", "full") and rescale:
        from magellanmapper_tpu.atlas import transformer
        out_path = transformer.get_transposed_image_path(
            img_path, rescale)
        if not os.path.exists(np_io.make_filenames(out_path)[0]):
            out_path = transformer.transpose_img(img_path, rescale=rescale)
            outputs["transformation"] = out_path

    if pipeline in ("detection", "full"):
        from magellanmapper_tpu.cv import stack_detect
        from magellanmapper_tpu.utils import libmag
        blobs_path = libmag.combine_paths(img_path, "blobs.npz")
        if not os.path.exists(blobs_path):
            img5d = np_io.read_file(img_path)
            res = (img5d.resolutions[0] if img5d.resolutions is not None
                   else resolutions or (1.0, 1.0, 1.0))
            blobs, timing = stack_detect.detect_blobs_stack(
                np.asarray(img5d.img[0]), roi_profile, res,
                channels=channels)
            blobs.path = blobs_path
            blobs.basename = os.path.basename(img_path)
            blobs.save_archive()
            outputs["detection"] = blobs_path
            _logger.info("detection: %d blobs in %.1fs", len(blobs),
                         timing.get("Total_stack", 0))

    if s3_bucket and pipeline == "full":
        from magellanmapper_tpu.cloud import aws
        from magellanmapper_tpu.io import subproc_io
        for stage, path in list(outputs.items()):
            if os.path.isfile(path):
                arc = subproc_io.compress_file(path)
                outputs[f"upload_{stage}"] = aws.upload_s3(arc, s3_bucket)

    if notify_url:
        from magellanmapper_tpu.cloud import notify
        notify.notify(
            notify_url,
            f"pipeline {pipeline} done for {img_path}: "
            + ", ".join(outputs))
    return outputs
