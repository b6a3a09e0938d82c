"""Atlas pipeline integration: register -> labels -> density -> stats.

Chains the #2 and #3 workloads end-to-end on synthetic data: a shifted
atlas registers onto a sample, labels transfer at order 0, a blob heat
map builds in registered space, and per-region metrics aggregate over
the transferred labels — the full ``--register single`` +
``make_density_images`` + ``vol_stats`` flow.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from magellanmapper_tpu.atlas import register, transform
from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import cv_nd, stack_detect
from magellanmapper_tpu.io import export_regions, np_io, sitk_io
from magellanmapper_tpu.settings.atlas_prof import (
    AtlasProfile, make_reg_param_map)
from magellanmapper_tpu.settings.roi_prof import ROIProfile
from magellanmapper_tpu.stats import vols
from magellanmapper_tpu.utils import libmag


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("atlas_pipe")
    rng = np.random.default_rng(11)
    shape = (32, 48, 48)

    # sample: ellipsoid brain + nuclei in the "cortex" shell
    zz, yy, xx = np.indices(shape).astype(np.float32)
    body = (((zz - 16) / 12) ** 2 + ((yy - 24) / 18) ** 2
            + ((xx - 24) / 18) ** 2)
    sample = np.exp(-body * 1.5).astype(np.float32)
    nuclei = []
    while len(nuclei) < 60:
        c = rng.uniform(4, np.asarray(shape) - 4)
        b = (((c[0] - 16) / 12) ** 2 + ((c[1] - 24) / 18) ** 2
             + ((c[2] - 24) / 18) ** 2)
        if 0.3 < b < 0.9:  # shell region
            nuclei.append(c)
    nuclei = np.asarray(nuclei)
    for cz, cy, cx in nuclei:
        dz, dy, dx = zz - cz, yy - cy, xx - cx
        sample += 0.6 * np.exp(-(dz**2 + dy**2 + dx**2) / 6.0)
    sample /= sample.max()
    base = str(tmp / "samp.npy")
    np_io.write_npy(base, sample[None])

    # atlas: the same body, shifted, with core/shell labels
    shift = np.array([2.0, -3.0, 1.0])
    atlas = np.asarray(transform.resample(
        jnp.asarray(np.exp(-body * 1.5).astype(np.float32)),
        {"t": jnp.asarray(-shift)}, "translation", shape))
    body_shift = (((zz - 16 - shift[0]) / 12) ** 2
                  + ((yy - 24 - shift[1]) / 18) ** 2
                  + ((xx - 24 - shift[2]) / 18) ** 2)
    labels = np.zeros(shape, np.int32)
    labels[body_shift < 0.3] = 1          # core
    labels[(body_shift >= 0.3) & (body_shift < 1.0)] = 2  # shell

    prof = AtlasProfile()
    prof["reg_translation"] = make_reg_param_map(
        "translation", 48, metric="ncc", num_resolutions=2)
    prof["reg_affine"] = None
    prof["reg_bspline"] = None
    out = register.register(
        base, {"atlas": atlas, "labels": labels}, prof,
        resolutions=(1, 1, 1), prefix=base)
    return tmp, base, sample, nuclei, out


class TestAtlasPipeline:
    def test_registration_quality(self, pipeline_out):
        tmp, base, sample, nuclei, out = pipeline_out
        assert out["metrics"]["DSC_atlas_sample"] > 0.85
        assert os.path.exists(
            sitk_io.reg_out_path(base, "annotation.mhd"))

    def test_density_image_from_detections(self, pipeline_out):
        tmp, base, sample, nuclei, out = pipeline_out
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["denoise_size"] = None
        blobs, _ = stack_detect.detect_blobs_stack(
            sample, prof, (1.0, 1.0, 1.0), preprocess=False)
        blobs.path = libmag.combine_paths(base, "blobs.npz")
        blobs.basename = "samp"
        blobs.save_archive()
        heat, heat_path = export_regions.make_density_image(base)
        assert heat.sum() == len(blobs)
        assert os.path.exists(heat_path)

    def test_regional_stats_localize_nuclei_to_shell(self, pipeline_out):
        tmp, base, sample, nuclei, out = pipeline_out
        labels_reg = sitk_io.load_registered_img(base, "annotation.mhd")
        heat = sitk_io.load_registered_img(base, "heat.mhd")
        df = vols.measure_labels_metrics(
            sample, labels_reg, heat_map=heat, combine_sides=True)
        df = df.set_index("Region")
        # nuclei were planted in the shell (label 2): nearly all detected
        # blobs must aggregate there after registration + label transfer
        assert df.loc[2, "Nuclei"] > df.loc[1, "Nuclei"]
        assert df.loc[2, "Nuclei"] >= 0.9 * heat.sum()
        # densities: shell much denser than core
        assert df.loc[2, "Density"] > 2 * max(df.loc[1, "Density"], 1e-9)
