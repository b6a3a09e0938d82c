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
        n_match = ref_detect.match_blob_sets(
            sharded[:, :3], single[:, :3], (3, 3, 3))
        assert n_match >= 0.95 * max(len(sharded), len(single))

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
        # shard 0's prepended halo is zero (global boundary)
        assert np.all(out[0, :2] == 0)
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
