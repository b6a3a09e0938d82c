"""StackColocalizer + DB-backed verify_rois tests."""

import numpy as np
import pytest

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import colocalizer, verifier
from magellanmapper_tpu.io import sqlite


def blobs_at(coords, channel):
    arr = np.column_stack([
        np.asarray(coords, float), np.full(len(coords), 3.0)])
    return blobs_mod.Blobs(arr).format_blobs(channel)


class TestStackColocalizer:
    def test_cross_block_dedup(self):
        # pair straddling a block boundary at z=128 must match exactly once
        c0 = [[126.0, 50, 50], [200, 80, 80]]
        c1 = [[127.0, 50, 50], [30, 30, 30]]
        blobs = np.vstack([blobs_at(c0, 0), blobs_at(c1, 1)])
        out = colocalizer.StackColocalizer.colocalize_stack(
            (256, 128, 128), blobs, (3, 3, 3), block_size=128)
        bm = out[(0, 1)]
        assert len(bm) == 1
        assert bm.df[colocalizer.BlobMatch.Cols.DIST.value][0] <= 3.0


class TestVerifyRois:
    def test_db_roundtrip_stats(self, tmp_path):
        db = sqlite.load_db(str(tmp_path / "verify.db"))
        detected = blobs_at(
            [[5, 5, 5], [10, 10, 10], [40, 40, 40]], 0)
        truth = blobs_at([[5, 5, 6], [10, 10, 10], [20, 20, 20]], 0)
        truth[:, 5] = 0  # truth rows flagged
        rois = [{"offset_x": 0, "offset_y": 0, "offset_z": 0,
                 "size_x": 64, "size_y": 64, "size_z": 64}]
        stats, msg = verifier.verify_rois(
            rois, detected, truth, (2, 2, 2), db, "exp1")
        pos, true_pos, false_pos = stats
        assert pos == 3
        assert true_pos == 2
        assert false_pos == 1
        assert "sensitivity" in msg
        db.close()
