"""Tests for the profile/config system."""

import os

import pytest

from magellanmapper_tpu.settings.roi_prof import ROIProfile, \
    is_identical_block_settings
from magellanmapper_tpu.settings.atlas_prof import AtlasProfile
from magellanmapper_tpu.settings.grid_search_prof import GridSearchProfile
from magellanmapper_tpu.settings import config as config_mod


def test_roi_profile_defaults():
    prof = ROIProfile()
    assert prof["min_sigma_factor"] == 3
    assert prof["max_sigma_factor"] == 5
    assert prof["num_sigma"] == 10
    assert prof["detection_threshold"] == 0.1
    assert prof["overlap"] == 0.5
    assert prof["segment_size"] == 500
    assert prof["denoise_size"] == 25


def test_roi_profile_chain():
    prof = ROIProfile()
    prof.add_profiles("lightsheet,4xnuc")
    # 4xnuc overrides lightsheet sigma factors (applied left-to-right)
    assert prof["min_sigma_factor"] == 3
    assert prof["max_sigma_factor"] == 4
    # lightsheet values not touched by 4xnuc persist
    assert prof["overlap"] == 0.55
    assert prof["isotropic"] == (0.96, 1, 1)
    assert prof[prof.NAME_KEY] == "lightsheet,4xnuc"


def test_unknown_profile_raises():
    prof = ROIProfile()
    with pytest.raises(KeyError):
        prof.add_profiles("no_such_profile")


def test_yaml_profile_roundtrip(tmp_path):
    import yaml
    path = tmp_path / "custom.yaml"
    path.write_text(yaml.safe_dump({"min_sigma_factor": 2.0}))
    prof = ROIProfile()
    prof.add_profiles(str(path))
    assert prof["min_sigma_factor"] == 2.0
    # hot reload on mtime change
    path.write_text(yaml.safe_dump({"min_sigma_factor": 9.0}))
    os.utime(path, (0, 0))
    assert prof.refresh_profile()
    assert prof["min_sigma_factor"] == 9.0


def test_atlas_profile_nested_update():
    prof = AtlasProfile()
    assert prof["reg_translation"]["max_iter"] == 2048
    prof.add_profiles("ncc")
    assert (prof["reg_bspline"]["metric_similarity"]
            == "AdvancedNormalizedCorrelation")
    # nested update must not clobber sibling keys
    assert prof["reg_bspline"]["grid_space_voxels"] == 50
    assert prof["metric_sim_fallback"][0] == 0.85


def test_grid_search_profile():
    prof = GridSearchProfile()
    prof.add_profiles("gridtest")
    assert "detection_threshold" in prof["hyperparams"]


def test_block_settings_identity():
    p1, p2 = ROIProfile(), ROIProfile()
    assert is_identical_block_settings([p1, p2])
    p2["segment_size"] = 100
    assert not is_identical_block_settings([p1, p2])


def test_config_roi_profile_fallback():
    cfg = config_mod.Config()
    prof = cfg.get_roi_profile(0)
    assert prof["num_sigma"] == 10
