"""Sharded detection tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import detector, ref_detect
from magellanmapper_tpu.parallel import halo, mesh as mesh_mod
from magellanmapper_tpu.settings.roi_prof import ROIProfile


def _nuclei(seed, shape, n):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    centers = np.column_stack([rng.uniform(6, s - 6, size=n) for s in shape])
    for cz, cy, cx in centers:
        sig = 4.0 / np.sqrt(3)
        vol += np.exp(-((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
                      / (2 * sig ** 2))
    return np.clip(vol / vol.max(), 0, None), centers


class TestMesh:
    def test_make_mesh_default(self):
        m = mesh_mod.make_mesh(8)
        assert m.shape["dp"] == 1 and m.shape["sp"] == 8

    def test_make_mesh_dp(self):
        m = mesh_mod.make_mesh(8, dp=2)
        assert m.shape["dp"] == 2 and m.shape["sp"] == 4

    def test_make_mesh_spy(self):
        m = mesh_mod.make_mesh(8, dp=2, spy=2)
        assert (m.shape["dp"], m.shape["sp"], m.shape["spy"]) == (2, 2, 2)

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            mesh_mod.make_mesh(8, dp=3, sp=3)


class TestShardedDetection:
    def test_matches_single_device(self):
        """Sharded (sp=4) whole-volume detection must agree with the
        single-device detector — halo exchange replaces overlap
        recompute exactly."""
        vol, centers = _nuclei(3, (64, 48, 48), 30)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["max_blobs_per_block"] = 512

        m = mesh_mod.make_mesh(4, dp=1)
        sharded = halo.detect_blobs_sharded(
            vol, prof, (1.0, 1.0, 1.0), mesh=m)
        single = detector.detect_blobs(vol, prof, (1.0, 1.0, 1.0))
        assert sharded is not None and single is not None
        # the halo is sized from the max LoG support, so interior
        # detections match single-shot exactly (BASELINE.md north star)
        n_match = ref_detect.match_blob_sets(
            sharded[:, :3], single[:, :3], (3, 3, 3))
        assert n_match >= 0.99 * max(len(sharded), len(single))

    def test_matches_single_device_spy(self):
        """(sp, spy) = (2, 2) z+y sharding must also match single-shot."""
        vol, centers = _nuclei(7, (40, 44, 44), 25)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 1.5
        prof["max_sigma_factor"] = 3.0
        prof["num_sigma"] = 4
        prof["max_blobs_per_block"] = 512

        m = mesh_mod.make_mesh(4, dp=1, sp=2, spy=2)
        sharded = halo.detect_blobs_sharded(
            vol, prof, (1.0, 1.0, 1.0), mesh=m)
        single = detector.detect_blobs(vol, prof, (1.0, 1.0, 1.0))
        assert sharded is not None and single is not None
        n_match = ref_detect.match_blob_sets(
            sharded[:, :3], single[:, :3], (3, 3, 3))
        assert n_match >= 0.99 * max(len(sharded), len(single))

    def test_preproc_parity(self):
        """Sharded in-step saturate/denoise (per denoise tile) must equal
        host-side preprocessing of the same padded volume."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv import blobs as blobs_mod
        from magellanmapper_tpu.cv.stack_detect import _preproc_one

        vol, centers = _nuclei(11, (48, 32, 32), 20)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 1.5
        prof["max_sigma_factor"] = 3.0
        prof["num_sigma"] = 4
        prof["denoise_size"] = 16
        prof["max_blobs_per_block"] = 512

        m = mesh_mod.make_mesh(4, dp=1)
        sharded = halo.detect_blobs_sharded(
            vol, prof, (1.0, 1.0, 1.0), mesh=m, preprocess=True,
            near_max=float(np.percentile(vol[::3], 99.5)))
        assert sharded is not None

        # host comparator: same tiled preproc + one-shot detection on the
        # unpadded volume (sharded must match exactly — reflect halos,
        # pad-zone peak masking)
        near_max = float(np.percentile(vol[::3], 99.5))
        prep = (
            ("clip_vmin", float(prof["clip_vmin"])),
            ("clip_vmax", float(prof["clip_vmax"])),
            ("max_thresh", near_max * prof["max_thresh_factor"]),
            ("clip_min", float(prof["clip_min"])),
            ("clip_max", float(prof["clip_max"])),
            ("tot_var_denoise", float(prof["tot_var_denoise"] or 0.0)),
            ("unsharp_strength", float(prof["unsharp_strength"] or 0.0)),
            ("erosion_threshold", float(prof["erosion_threshold"] or 0.0)),
        )
        pre = np.asarray(_preproc_one(
            jnp.asarray(vol.astype(np.float32)), (16, 16, 16), prep))
        sigmas = tuple(detector.sigma_list(1.5, 3.0, 4))
        raw, valid = detector.blob_log(
            jnp.asarray(pre), sigmas, prof["detection_threshold"],
            prof["overlap"], 512)
        raw = np.asarray(raw)[np.asarray(valid)]
        raw = raw[raw[:, 0] < vol.shape[0]]
        raw[:, 3] *= np.sqrt(3)
        single = blobs_mod.Blobs(raw).format_blobs(0)
        n_match = ref_detect.match_blob_sets(
            sharded[:, :3], single[:, :3], (2, 2, 2))
        assert n_match >= 0.99 * max(len(sharded), len(single))

    def test_halo_exchange_planes(self):
        """Halo planes must carry true neighbor content over ICI."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map

        m = mesh_mod.make_mesh(4, dp=1)
        z = 16
        vol = np.arange(z * 4 * 4, dtype=np.float32).reshape(z, 4, 4)

        fn = shard_map(
            lambda v: halo.halo_exchange_z(v, 2)[None],
            mesh=m, in_specs=P("sp", None, None),
            out_specs=P("sp", None, None, None), check_vma=False)
        with m:
            out = np.asarray(fn(jnp.asarray(vol)))
        shard_z = z // 4
        # shard 1's prepended halo = shard 0's last 2 planes
        np.testing.assert_array_equal(
            out[1, :2], vol[shard_z - 2:shard_z])
        # shard 0's prepended halo reflects its own first planes
        # (scipy 'reflect' boundary: d c b a | a b c d)
        np.testing.assert_array_equal(out[0, :2], vol[1::-1])
        # shard 2's appended halo = shard 3's first 2 planes
        np.testing.assert_array_equal(
            out[2, -2:], vol[3 * shard_z:3 * shard_z + 2])


class TestDistributedBlocks:
    def test_sharded_blocks_match_single(self):
        """Block batches sharded over 8 devices must match the
        single-device whole-stack result."""
        from magellanmapper_tpu.cv import ref_detect, stack_detect
        from magellanmapper_tpu.parallel import distributed
        vol, centers = _nuclei(21, (40, 60, 60), 30)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["segment_size"] = 30
        prof["denoise_size"] = None
        prof["max_blobs_per_block"] = 512
        m = mesh_mod.make_mesh(8, dp=8, sp=1)
        sharded, t1 = distributed.detect_blobs_blocks_sharded(
            vol, prof, (1.0, 1.0, 1.0), mesh=m)
        single, t2 = stack_detect.detect_blobs_blocks(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        n_match = ref_detect.match_blob_sets(
            sharded[:, :3], single[:, :3], (2, 2, 2))
        assert n_match >= 0.97 * max(len(sharded), len(single))


class TestShardedMultichannel:
    def test_channels_stamped(self):
        vol, centers = _nuclei(31, (32, 40, 40), 12)
        img = np.stack([vol, vol], axis=-1)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 4
        prof["max_blobs_per_block"] = 256
        m = mesh_mod.make_mesh(4, dp=1)
        blobs = halo.detect_blobs_sharded_stack(
            img, prof, (1.0, 1.0, 1.0), mesh=m)
        assert blobs is not None
        assert set(np.unique(blobs[:, 6]).tolist()) == {0.0, 1.0}


class TestShardedDpBatch:
    def test_channels_batch_over_dp(self):
        """Channels sharing a profile ride the dp mesh axis in one
        dispatch and match per-channel dp=1 runs exactly."""
        vol_a, _ = _nuclei(41, (32, 40, 40), 12)
        vol_b, _ = _nuclei(43, (32, 40, 40), 12)
        img = np.stack([vol_a, vol_b], axis=-1)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 4
        prof["max_blobs_per_block"] = 256

        m_dp = mesh_mod.make_mesh(8, dp=2, sp=4)
        batched = halo.detect_blobs_sharded_stack(
            img, prof, (1.0, 1.0, 1.0), mesh=m_dp)
        assert batched is not None

        m1 = mesh_mod.make_mesh(4, dp=1, sp=4)
        singles = []
        for chl, v in ((0, vol_a), (1, vol_b)):
            b = halo.detect_blobs_sharded(v, prof, (1.0, 1.0, 1.0), mesh=m1)
            from magellanmapper_tpu.cv import blobs as blobs_mod
            blobs_mod.Blobs.set_blob_channel(b, chl)
            singles.append(b)
        single = np.vstack(singles)
        assert len(batched) == len(single)
        sa = set(map(tuple, np.round(batched[:, [0, 1, 2, 6]], 3)))
        sb = set(map(tuple, np.round(single[:, [0, 1, 2, 6]], 3)))
        assert sa == sb

    def test_dp_tail_fill_dropped(self):
        """A batch shorter than dp pads internally and returns only the
        true volumes' results."""
        vol, _ = _nuclei(47, (24, 32, 32), 8)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 3.5
        prof["num_sigma"] = 3
        prof["max_blobs_per_block"] = 128
        m_dp = mesh_mod.make_mesh(8, dp=2, sp=4)
        res = halo.detect_blobs_sharded_batch(
            [vol], prof, (1.0, 1.0, 1.0), mesh=m_dp)
        assert len(res) == 1 and res[0] is not None

    def test_per_channel_near_max(self):
        """With preprocess=True, dp-batched channels of very different
        intensity scales must each saturate with their OWN near-max.
        A dim channel (0.01x) saturated against the bright channel's
        near-max would be squashed to ~0 and lose all its blobs (the
        pre-fix behavior baked volume 0's near-max into the step)."""
        vol, _ = _nuclei(53, (32, 32, 32), 10)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 4
        prof["denoise_size"] = 16
        prof["max_blobs_per_block"] = 256
        m_dp = mesh_mod.make_mesh(8, dp=2, sp=4)
        res = halo.detect_blobs_sharded_batch(
            [vol, vol * 0.01], prof, (1.0, 1.0, 1.0), mesh=m_dp,
            preprocess=True)
        assert res[0] is not None and res[1] is not None
        # saturation normalizes each channel by its own near-max, so the
        # scaled channel detects the same blobs at the same coordinates
        a = set(map(tuple, np.round(res[0][:, :3], 2)))
        b = set(map(tuple, np.round(res[1][:, :3], 2)))
        assert len(a & b) >= 0.95 * max(len(a), len(b))
