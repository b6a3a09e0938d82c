"""Block split/merge identity + whole-stack detection tests."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import chunking, detector, ref_detect, stack_detect
from magellanmapper_tpu.settings.roi_prof import ROIProfile


class TestSplitMerge:
    def test_split_remerge_identity(self, rng):
        """Split with overlap then merge must reproduce the stack
        (reference test_chunking.stack_split_remerge semantics)."""
        vol = rng.integers(0, 1000, (60, 50, 43)).astype(np.float32)
        max_pixels = (20, 20, 20)
        overlap = np.array([3, 3, 3])
        slices, offsets = chunking.stack_splitter(
            vol.shape, max_pixels, overlap)
        sub_rois = np.zeros(slices.shape, dtype=object)
        for coord in np.ndindex(*slices.shape):
            sub_rois[coord] = vol[slices[coord]]
        shape_out = chunking.get_split_stack_total_shape(sub_rois, overlap)
        np.testing.assert_array_equal(shape_out, vol.shape)
        out = np.zeros(vol.shape, vol.dtype)
        chunking.merge_split_stack2(sub_rois, overlap, 0, out)
        np.testing.assert_array_equal(out, vol)

    def test_split_no_overlap(self, rng):
        vol = rng.normal(size=(25, 25, 25)).astype(np.float32)
        slices, offsets = chunking.stack_splitter(vol.shape, (10, 10, 10))
        assert slices.shape == (3, 3, 3)
        np.testing.assert_array_equal(offsets[2, 2, 2], [20, 20, 20])
        sub_rois = np.zeros(slices.shape, dtype=object)
        for coord in np.ndindex(*slices.shape):
            sub_rois[coord] = vol[slices[coord]]
        out = np.zeros(vol.shape, vol.dtype)
        chunking.merge_split_stack2(sub_rois, None, 0, out)
        np.testing.assert_array_equal(out, vol)

    def test_merge_blobs_tags_coords(self):
        rois = np.zeros((1, 1, 2), dtype=object)
        rois[0, 0, 0] = np.array([[1.0, 2, 3, 4]])
        rois[0, 0, 1] = np.array([[5.0, 6, 7, 8], [9, 10, 11, 12]])
        merged = chunking.merge_blobs(rois)
        assert merged.shape == (3, 7)
        np.testing.assert_array_equal(merged[0, 4:], [0, 0, 0])
        np.testing.assert_array_equal(merged[1, 4:], [0, 0, 1])


def _nuclei_volume(seed, shape, n):
    rng = np.random.default_rng(seed)
    vol = np.zeros(shape, dtype=np.float32)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    centers = np.column_stack([rng.uniform(6, s - 6, size=n) for s in shape])
    for cz, cy, cx in centers:
        sig = 4.5 / np.sqrt(3)
        vol += np.exp(-((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
                      / (2 * sig ** 2))
    vol += rng.normal(scale=0.02, size=shape).astype(np.float32)
    return np.clip(vol, 0, None) / vol.max(), centers


class TestStackDetect:
    def _profile(self):
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["segment_size"] = 40
        prof["denoise_size"] = None  # no preprocessing sub-blocks
        prof["max_blobs_per_block"] = 1024
        return prof

    def test_blocked_matches_single_shot(self):
        """Chunked whole-stack detection must agree with detecting the
        whole volume in one shot (cross-block pruning correctness)."""
        vol, centers = _nuclei_volume(7, (60, 80, 80), 60)
        prof = self._profile()
        res = (1.0, 1.0, 1.0)
        blobs, timing = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        assert blobs is not None
        single = detector.detect_blobs(vol, prof, res)
        tol = detector.calc_overlap(res)
        n_match = ref_detect.match_blob_sets(
            blobs[:, :3], single[:, :3], tol)
        larger = max(len(blobs), len(single))
        assert n_match >= 0.95 * larger
        assert timing["Detection"] > 0

    def test_finds_planted_blobs_blocked(self):
        vol, centers = _nuclei_volume(11, (50, 70, 70), 40)
        blobs, _ = stack_detect.detect_blobs_blocks(
            vol, self._profile(), (1.0, 1.0, 1.0), preprocess=False)
        n_match = ref_detect.match_blob_sets(
            blobs[:, :3], centers, (3, 3, 3))
        assert n_match >= 0.9 * len(centers)

    def test_gather_path_matches_resident(self, monkeypatch):
        """Volumes over the residency budget fall back to block gather;
        both staging modes must produce identical blobs (the resident
        path shadows gather in every small-volume test otherwise)."""
        vol, _ = _nuclei_volume(19, (50, 70, 70), 40)
        prof = self._profile()
        res = (1.0, 1.0, 1.0)
        resident, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        monkeypatch.setattr(stack_detect, "_RESIDENT_BYTES_BUDGET", 0)
        gathered, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        assert resident is not None and gathered is not None
        np.testing.assert_allclose(
            np.sort(resident, axis=0), np.sort(gathered, axis=0),
            rtol=1e-5, atol=1e-5)

    def test_slab_plan_geometry(self):
        """_plan_slabs: uniform extents, clamped origins, every block
        window contained in its slab, every grid coord covered once."""
        shape = (50, 70, 70)
        prof = self._profile()
        blocks = stack_detect.setup_blocks(prof, shape, (1.0, 1.0, 1.0))
        block_shape = np.minimum(
            blocks.max_pixels + blocks.overlap, shape)
        plan = stack_detect._plan_slabs(
            blocks.sub_roi_slices.shape, blocks, block_shape, shape,
            itemsize=4, budget=900_000)
        assert plan is not None
        sz, sy = plan.extent
        assert plan.bytes_per_slab == sz * sy * shape[2] * 4
        assert plan.bytes_per_slab <= 900_000
        seen = []
        for z0, y0, coords in plan.slabs:
            assert 0 <= z0 <= shape[0] - sz
            assert 0 <= y0 <= shape[1] - sy
            for c in coords:
                w = stack_detect._window_for_block(
                    shape, blocks.sub_rois_offsets[c], block_shape)
                assert z0 <= w[0] and w[0] + block_shape[0] <= z0 + sz
                assert y0 <= w[1] and w[1] + block_shape[1] <= y0 + sy
            seen.extend(coords)
        assert sorted(seen) == sorted(
            np.ndindex(*blocks.sub_roi_slices.shape))

    def test_slab_plan_impossible_returns_none(self):
        shape = (50, 70, 70)
        prof = self._profile()
        blocks = stack_detect.setup_blocks(prof, shape, (1.0, 1.0, 1.0))
        block_shape = np.minimum(
            blocks.max_pixels + blocks.overlap, shape)
        assert stack_detect._plan_slabs(
            blocks.sub_roi_slices.shape, blocks, block_shape, shape,
            itemsize=4, budget=1000) is None

    @pytest.mark.parametrize("budget", [900_000, 600_000])
    def test_slab_path_matches_resident(self, monkeypatch, budget):
        """Volumes past the whole-volume budget use z/y-slab resident
        staging; blobs must be identical to whole-volume staging.
        budget=900k exercises full-Y z-slabs, 600k forces Y chunking."""
        vol, _ = _nuclei_volume(23, (50, 70, 70), 40)
        prof = self._profile()
        res = (1.0, 1.0, 1.0)
        resident, t_res = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        monkeypatch.setattr(
            stack_detect, "_RESIDENT_BYTES_BUDGET", budget)
        slab, t_slab = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        assert resident is not None and slab is not None
        np.testing.assert_allclose(
            np.sort(resident, axis=0), np.sort(slab, axis=0),
            rtol=1e-5, atol=1e-5)
        # slab mode ships ~1x + halos; gather would ship every padded
        # window (~2.2x). Whole-volume residency is the 1.0x floor.
        monkeypatch.setattr(stack_detect, "_RESIDENT_BYTES_BUDGET", 0)
        gathered, t_gather = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        np.testing.assert_allclose(
            np.sort(resident, axis=0), np.sort(gathered, axis=0),
            rtol=1e-5, atol=1e-5)
        assert t_res["h2d_bytes"] == vol.nbytes
        assert (vol.nbytes <= t_slab["h2d_bytes"]
                < t_gather["h2d_bytes"])

    def test_slab_mode_multichannel_matches(self, monkeypatch):
        """Slab staging per channel on a (Z, Y, X, C) stack: channel
        views are strided, so the slab reads must still be exact."""
        v0, _ = _nuclei_volume(37, (50, 70, 70), 30)
        v1, _ = _nuclei_volume(41, (50, 70, 70), 25)
        stack = np.stack([v0, v1], axis=-1)
        prof = self._profile()
        res = (1.0, 1.0, 1.0)
        full, _ = stack_detect.detect_blobs_blocks(
            stack, prof, res, preprocess=False)
        monkeypatch.setattr(
            stack_detect, "_RESIDENT_BYTES_BUDGET", 900_000)
        slab, t = stack_detect.detect_blobs_blocks(
            stack, prof, res, preprocess=False)
        np.testing.assert_allclose(
            np.sort(slab, axis=0), np.sort(full, axis=0),
            rtol=1e-5, atol=1e-5)
        # both channels shipped via slabs
        assert t["h2d_bytes"] >= stack.nbytes

    def test_slab_mode_overflow_retry(self, monkeypatch):
        """A capacity overflow in slab mode re-detects through the
        gather dispatch path at doubled capacity — no blobs lost."""
        vol, _ = _nuclei_volume(31, (50, 70, 70), 40)
        prof = self._profile()
        res = (1.0, 1.0, 1.0)
        full, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        # tiny initial capacity: every block overflows and retries
        prof["max_blobs_per_block"] = None
        monkeypatch.setattr(
            stack_detect, "_RESIDENT_BYTES_BUDGET", 900_000)

        def tiny_cap(settings, block_voxels):
            return 4
        monkeypatch.setattr(stack_detect, "_choose_capacity", tiny_cap)
        prof["max_blobs_per_block"] = None
        retried, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=False)
        assert retried is not None
        # retry recovered the full population (capacity doubled until
        # blocks fit; same final blob set)
        assert len(retried) == len(full)
        np.testing.assert_allclose(
            np.sort(retried, axis=0), np.sort(full, axis=0),
            rtol=1e-5, atol=1e-5)

    def test_slab_path_with_preproc_matches(self, monkeypatch):
        """Slab carving must compose with per-denoise-unit preproc the
        same way whole-volume residency does."""
        vol, _ = _nuclei_volume(29, (50, 70, 70), 40)
        prof = self._profile()
        prof["denoise_size"] = 25
        res = (1.0, 1.0, 1.0)
        resident, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=True)
        monkeypatch.setattr(
            stack_detect, "_RESIDENT_BYTES_BUDGET", 900_000)
        slab, _ = stack_detect.detect_blobs_blocks(
            vol, prof, res, preprocess=True)
        assert resident is not None and slab is not None
        np.testing.assert_allclose(
            np.sort(resident, axis=0), np.sort(slab, axis=0),
            rtol=1e-5, atol=1e-5)

    def test_no_duplicates_after_pruning(self):
        vol, _ = _nuclei_volume(13, (50, 70, 70), 40)
        blobs, _ = stack_detect.detect_blobs_blocks(
            vol, self._profile(), (1.0, 1.0, 1.0), preprocess=False)
        # no two blobs within a 2px box of each other after border pruning
        from scipy.spatial import cKDTree
        tree = cKDTree(blobs[:, :3])
        pairs = tree.query_pairs(1.0)
        assert len(pairs) == 0

    def test_multichannel_stack(self):
        vol, _ = _nuclei_volume(17, (40, 48, 48), 15)
        img = np.stack([vol, vol * 0.5], axis=-1)
        blobs, timing = stack_detect.detect_blobs_stack(
            img, self._profile(), (1.0, 1.0, 1.0), preprocess=False)
        arr = blobs.blobs
        assert arr is not None
        chls = np.unique(arr[:, 6])
        assert set(chls.tolist()) <= {0.0, 1.0}
        assert (arr[:, 6] == 0).sum() > 0

    def test_setup_blocks_geometry(self):
        prof = self._profile()
        prof["exclude_border"] = (1, 0, 0)
        blocks = stack_detect.setup_blocks(prof, (100, 100, 100), (1, 1, 1))
        # overlap raised to 2*exclude+1 when needed; padding zeroed there
        assert blocks.overlap[0] >= 3
        assert blocks.overlap_padding[0] == 0
        assert blocks.sub_roi_slices.shape == (3, 3, 3)


class TestSubBlockPreproc:
    def test_matches_per_subblock_loop(self, rng):
        """The reshaped vmap must equal preprocessing each denoise
        sub-block independently (reference detect_sub_roi loop)."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv.stack_detect import _preproc_sub_blocks
        from magellanmapper_tpu.ops import preproc

        vol = rng.random((16, 24, 24)).astype(np.float32)
        dshape = (8, 8, 8)
        params = {
            "clip_vmin": 5.0, "clip_vmax": 99.5, "max_thresh": 0.5,
            "clip_min": 0.2, "clip_max": 1.0, "tot_var_denoise": 0.0,
            "unsharp_strength": 0.3, "erosion_threshold": 0.2,
        }
        fused = np.asarray(_preproc_sub_blocks(
            jnp.asarray(vol), dshape, params))

        expected = np.zeros_like(vol)
        for z0 in range(0, 16, 8):
            for y0 in range(0, 24, 8):
                for x0 in range(0, 24, 8):
                    tile = vol[z0:z0+8, y0:y0+8, x0:x0+8]
                    t = preproc.saturate(
                        jnp.asarray(tile), 5.0, 99.5, 0.5)
                    t = preproc.denoise(
                        t, 0.2, 1.0, 0.0, 0.3, 0.2)
                    expected[z0:z0+8, y0:y0+8, x0:x0+8] = np.asarray(t)
        np.testing.assert_allclose(fused, expected, rtol=1e-5, atol=1e-6)


class TestEdgeCases:
    def test_zero_volume_returns_empty(self):
        vol = np.zeros((40, 48, 48), np.float32)
        prof = ROIProfile()
        prof["segment_size"] = 30
        prof["denoise_size"] = None
        prof["max_blobs_per_block"] = 256
        blobs, timing = stack_detect.detect_blobs_stack(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        assert len(blobs) == 0
        assert blobs.blobs is None

    def test_volume_smaller_than_block(self, rng):
        vol = rng.random((10, 12, 12)).astype(np.float32)
        zz, yy, xx = np.indices(vol.shape).astype(np.float32)
        vol += 3 * np.exp(-((zz-5)**2 + (yy-6)**2 + (xx-6)**2) / 5.0)
        vol /= vol.max()
        prof = ROIProfile()
        prof["min_sigma_factor"] = 1.5
        prof["max_sigma_factor"] = 3.0
        prof["num_sigma"] = 4
        prof["denoise_size"] = None
        prof["max_blobs_per_block"] = 64
        blobs, _ = stack_detect.detect_blobs_blocks(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        assert blobs is not None and len(blobs) >= 1
        # no blob coordinates in the reflect-pad zone
        assert np.all(blobs[:, :3] < np.asarray(vol.shape))


class TestCapacityOverflowRetry:
    def test_dense_block_loses_no_blobs(self):
        """A block whose detections overflow the blob buffer must
        re-detect at doubled capacity instead of truncating (reference
        semantics: dynamic lists never truncate, stack_detect.py:169)."""
        vol, centers = _nuclei_volume(17, (40, 60, 60), 48)
        prof = ROIProfile()
        prof["min_sigma_factor"] = 2.0
        prof["max_sigma_factor"] = 4.0
        prof["num_sigma"] = 5
        prof["segment_size"] = 100   # one block holds everything
        prof["denoise_size"] = None
        prof["max_blobs_per_block"] = 8   # far below the blob count
        blobs, _ = stack_detect.detect_blobs_blocks(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        assert blobs is not None
        # zero lost blobs: identical to an ample-capacity run
        prof["max_blobs_per_block"] = 1024
        full, _ = stack_detect.detect_blobs_blocks(
            vol, prof, (1.0, 1.0, 1.0), preprocess=False)
        assert len(blobs) == len(full)
        n_match = ref_detect.match_blob_sets(
            blobs[:, :3], full[:, :3], (1, 1, 1))
        assert n_match == len(full)


class TestPruneAllRemoved:
    def test_all_blobs_outside_kept_ranges_returns_none(self):
        """prune_blobs must return None (not an empty slice artifact)
        when no blob survives (round-1 weak item 9)."""
        prof = ROIProfile()
        prof["segment_size"] = 20
        prof["denoise_size"] = None
        shape = (40, 20, 20)
        blocks = stack_detect.setup_blocks(prof, shape, (1.0, 1.0, 1.0))
        seg_rois = np.full(blocks.sub_roi_slices.shape, None, dtype=object)
        # a single blob past the stack's end never lands in any kept
        # range or overlap band -> everything pruned away
        bad = np.zeros((1, 13))
        bad[0, :4] = (45.0, 5.0, 5.0, 2.0)
        coord = tuple(np.subtract(blocks.sub_roi_slices.shape, 1))
        seg_rois[coord] = bad
        out = stack_detect.prune_blobs(seg_rois, blocks, shape, [0])
        assert out is None

    def test_empty_seg_rois_returns_none(self):
        prof = ROIProfile()
        prof["segment_size"] = 20
        prof["denoise_size"] = None
        blocks = stack_detect.setup_blocks(
            prof, (40, 20, 20), (1.0, 1.0, 1.0))
        seg_rois = np.full(blocks.sub_roi_slices.shape, None, dtype=object)
        assert stack_detect.prune_blobs(
            seg_rois, blocks, (40, 20, 20), [0]) is None


class TestFusedTilePreproc:
    def test_fused_matches_tiled_path(self):
        """The Pallas-percentile fused preproc (one percentile kernel +
        block-diagonal unsharp bands + masked-shift erosion) must match
        the per-tile reference path to float tolerance."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv.stack_detect import (
            _preproc_sub_blocks, _preproc_sub_blocks_fused)
        rng = np.random.default_rng(3)
        vol = (rng.random((16, 24, 24)) * 900).astype(np.float32)
        # bright spots so erosion gating fires in some tiles
        vol[4:7, 4:7, 4:7] += 4000
        params = {
            "clip_vmin": 5.0, "clip_vmax": 99.5, "max_thresh": 700.0,
            "clip_min": 0.2, "clip_max": 1.0, "tot_var_denoise": 0.0,
            "unsharp_strength": 0.3, "erosion_threshold": 0.2,
        }
        legacy = np.asarray(_preproc_sub_blocks(
            jnp.asarray(vol), (8, 8, 8), params))
        fused = np.asarray(_preproc_sub_blocks_fused(
            jnp.asarray(vol), (8, 8, 8), params))
        np.testing.assert_allclose(fused, legacy, rtol=2e-5, atol=2e-5)

    def test_pad_symmetric_wider_than_axis(self):
        """Blocks thinner than the denoise tile pad by more than their
        own extent; the sliver path must reproduce numpy 'symmetric'
        repeated reflection instead of slicing at a negative start."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv.stack_detect import _pad_symmetric
        rng = np.random.default_rng(7)
        for shape, pad in [((2, 5, 3), (22, 3, 9)), ((1, 1, 4), (7, 5, 0)),
                           ((3, 8, 2), (0, 0, 11))]:
            vol = rng.random(shape).astype(np.float32)
            got = np.asarray(_pad_symmetric(jnp.asarray(vol), pad))
            want = np.pad(vol, [(0, p) for p in pad], mode="symmetric")
            np.testing.assert_array_equal(got, want)

    def test_fused_thin_block(self):
        """A z-extent smaller than the denoise tile (thin stack / ragged
        block) must run and match the tiled path."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv.stack_detect import (
            _preproc_sub_blocks, _preproc_sub_blocks_fused)
        rng = np.random.default_rng(11)
        vol = (rng.random((2, 24, 24)) * 500).astype(np.float32)
        params = {
            "clip_vmin": 5.0, "clip_vmax": 99.5, "max_thresh": None,
            "clip_min": 0.0, "clip_max": 1.0, "tot_var_denoise": 0.0,
            "unsharp_strength": 0.3, "erosion_threshold": 0.0,
        }
        legacy = np.asarray(_preproc_sub_blocks(
            jnp.asarray(vol), (8, 8, 8), params))
        fused = np.asarray(_preproc_sub_blocks_fused(
            jnp.asarray(vol), (8, 8, 8), params))
        np.testing.assert_allclose(fused, legacy, rtol=2e-5, atol=2e-5)

    def test_fused_uneven_tiles(self):
        """Edge tiles (symmetric-padded) must also match."""
        import jax.numpy as jnp
        from magellanmapper_tpu.cv.stack_detect import (
            _preproc_sub_blocks, _preproc_sub_blocks_fused)
        rng = np.random.default_rng(5)
        vol = (rng.random((11, 13, 19)) * 100).astype(np.float32)
        params = {
            "clip_vmin": 5.0, "clip_vmax": 99.5, "max_thresh": None,
            "clip_min": 0.0, "clip_max": 1.0, "tot_var_denoise": 0.0,
            "unsharp_strength": 0.3, "erosion_threshold": 0.0,
        }
        legacy = np.asarray(_preproc_sub_blocks(
            jnp.asarray(vol), (8, 8, 8), params))
        fused = np.asarray(_preproc_sub_blocks_fused(
            jnp.asarray(vol), (8, 8, 8), params))
        np.testing.assert_allclose(fused, legacy, rtol=2e-5, atol=2e-5)
