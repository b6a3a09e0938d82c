"""Blob colocalization across channels.

Equivalent of ``magmap/cv/colocalizer.py``: intensity-based colocalization
(``colocalize_blobs`` ``:340``) and match-based colocalization via
Hungarian assignment between channel pairs (``colocalize_blobs_match``
``:444``), plus the ``BlobMatch`` dataframe wrapper (``:20``).

TPU re-design of the intensity path: instead of labeling and dilating a
per-blob mask then looping blobs in Python, the ball-neighborhood mean is
ONE stencil convolution per channel on device; per-blob surround means are
then gathered at blob coordinates.
"""

from __future__ import annotations

from enum import Enum
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd

from magellanmapper_tpu.cv import blobs as blobs_mod
from magellanmapper_tpu.cv import verifier
from magellanmapper_tpu.ops import filters


class BlobMatch:
    """Blob-match table (reference ``colocalizer.BlobMatch``)."""

    class Cols(Enum):
        MATCH_ID = "MatchID"
        ROI_ID = "RoiID"
        BLOB1_ID = "Blob1ID"
        BLOB1 = "Blob1"
        BLOB2_ID = "Blob2ID"
        BLOB2 = "Blob2"
        DIST = "Distance"

    def __init__(self, matches=None, match_id=None, roi_id=None,
                 blob1_id=None, blob2_id=None, df=None):
        self.df: Optional[pd.DataFrame] = None
        self.coords: Optional[np.ndarray] = None
        self.cmap: Optional[np.ndarray] = None
        if df is not None:
            self.df = df
            return
        if matches is None:
            return
        rows = []
        for i, match in enumerate(matches):
            blob1, blob2, dist = match
            rows.append({
                self.Cols.MATCH_ID.value:
                    match_id[i] if match_id is not None else None,
                self.Cols.ROI_ID.value:
                    roi_id[i] if roi_id is not None else None,
                self.Cols.BLOB1_ID.value:
                    blob1_id[i] if blob1_id is not None else None,
                self.Cols.BLOB1.value: np.asarray(blob1),
                self.Cols.BLOB2_ID.value:
                    blob2_id[i] if blob2_id is not None else None,
                self.Cols.BLOB2.value: np.asarray(blob2),
                self.Cols.DIST.value: dist,
            })
        self.df = pd.DataFrame(rows)

    def __len__(self):
        return 0 if self.df is None else len(self.df)

    def get_blobs(self, n: int) -> Optional[np.ndarray]:
        """Stack blob arrays from side ``n`` (1 or 2)."""
        col = self.Cols.BLOB1 if n == 1 else self.Cols.BLOB2
        if self.df is None or len(self.df) == 0:
            return None
        return np.vstack(self.df[col.value])

    def update_blobs(self, fn, *args):
        """Apply ``fn(blobs, *args)`` to both blob columns."""
        if self.df is None:
            return
        for col in (self.Cols.BLOB1, self.Cols.BLOB2):
            blobs = self.get_blobs(1 if col is self.Cols.BLOB1 else 2)
            if blobs is not None:
                blobs = fn(blobs, *args)
                self.df[col.value] = [b for b in blobs]


def _ball_mean(roi_chl: np.ndarray, radius: int = 2) -> np.ndarray:
    """Mean intensity over a ball neighborhood, one device stencil."""
    fp = filters.ball_footprint(radius)
    vol = jnp.asarray(roi_chl, jnp.float32)
    r = [s // 2 for s in fp.shape]
    padded = jnp.pad(vol, [(ri, ri) for ri in r], mode="symmetric")
    acc = None
    for off in np.argwhere(fp):
        sl = tuple(slice(o, o + s) for o, s in zip(off, vol.shape))
        acc = padded[sl] if acc is None else acc + padded[sl]
    return np.asarray(acc / fp.sum())


def colocalize_blobs(
        roi: np.ndarray, blobs: np.ndarray, thresh=None) -> np.ndarray:
    """Intensity-based colocalization (reference ``colocalizer.py:340``).

    For each channel, a blob's surround mean (ball radius 2) is compared
    with that channel's threshold — the minimum surround mean of the
    channel's own blobs ("min", default) or a percentile.

    Returns ``(n_blobs, n_channels)`` uint8 matrix.
    """
    if blobs is None or roi is None or roi.ndim < 4:
        return None
    if thresh is None:
        thresh = "min"
    n_chl = roi.shape[3]
    blobs_roi, roi_mask = blobs_mod.get_blobs_in_roi(
        blobs, (0, 0, 0), roi.shape[:3], reverse=False)
    coords = np.clip(
        blobs_roi[:, :3].astype(int), 0,
        np.asarray(roi.shape[:3]) - 1)
    blob_chl = blobs_mod.Blobs.get_blobs_channel(blobs_roi).astype(int)

    # surround means per channel at every blob location
    means = np.stack([
        _ball_mean(roi[..., c])[coords[:, 0], coords[:, 1], coords[:, 2]]
        for c in range(n_chl)], axis=1)  # (n_blobs, n_chl)

    threshs = []
    for c in range(n_chl):
        own = means[blob_chl == c, c]
        if thresh == "min":
            threshs.append(own.min() if own.size else None)
        else:
            src = own if own.size else roi[..., c].reshape(-1)
            threshs.append(np.percentile(src, thresh))

    colocs_roi = np.zeros((len(blobs_roi), n_chl), dtype=np.uint8)
    for c in range(n_chl):
        if threshs[c] is None:
            continue
        colocs_roi[:, c] = (means[:, c] >= threshs[c]).astype(np.uint8)

    colocs = np.zeros((len(blobs), n_chl), dtype=np.uint8)
    colocs[roi_mask] = colocs_roi
    return colocs


def colocalize_blobs_match(
        blobs: np.ndarray, offset: Sequence[int], size: Sequence[int],
        tol: Sequence[float], channels: Optional[Sequence[int]] = None
) -> dict:
    """Match-based colocalization between channel pairs
    (reference ``colocalizer.py:444``): Hungarian assignment of blobs in
    one channel to another within tolerance.

    Returns dict mapping ``(chl1, chl2) -> BlobMatch``.
    """
    if blobs is None:
        return {}
    if channels is None:
        channels = np.unique(
            blobs_mod.Blobs.get_blobs_channel(blobs)).astype(int)
    thresh, scaling, inner_padding, *_ = verifier.setup_match_blobs_roi(tol)
    matches_all = {}
    for i, c1 in enumerate(channels):
        for c2 in channels[i + 1:]:
            b1 = blobs_mod.Blobs.blobs_in_channel(blobs, c1)
            b2 = blobs_mod.Blobs.blobs_in_channel(blobs, c2)
            b1_plus, b2_plus, off_in, size_in, matches = \
                verifier.match_blobs_roi(
                    b2, b1, offset, size, thresh, scaling, inner_padding)
            matches_all[(int(c1), int(c2))] = BlobMatch(matches)
    return matches_all


class StackColocalizer:
    """Whole-stack match-based colocalization with block re-chunking
    (reference ``colocalizer.StackColocalizer :221``).

    Re-chunks the blob set with inner-padding halos, matches channel
    pairs per block, then prunes cross-block duplicate matches keeping
    the shortest distance (reference ``:296-335``).
    """

    @classmethod
    def colocalize_stack(
            cls, shape, blobs: np.ndarray, tol,
            block_size: int = 128,
            channels: Optional[Sequence[int]] = None) -> dict:
        """Match-colocalize blobs across the whole stack.

        Args:
            shape: z,y,x stack shape.
            blobs: all blobs (N x >=7).
            tol: per-axis matching tolerance.
            block_size: re-chunk edge length.
            channels: channels to pair; defaults to all present.

        Returns:
            dict ``(chl1, chl2) -> BlobMatch`` with duplicates pruned.
        """
        from magellanmapper_tpu.cv import chunking as chunking_mod
        if channels is None:
            channels = np.unique(
                blobs_mod.Blobs.get_blobs_channel(blobs)).astype(int)
        tol = np.asarray(tol, float)
        pad = np.ceil(tol).astype(int)
        slices, offsets = chunking_mod.stack_splitter(
            shape, (block_size,) * 3, pad)

        collected: dict = {}
        for coord in np.ndindex(*slices.shape):
            sl = slices[coord]
            lo = np.asarray([s.start for s in sl])
            hi = np.asarray([s.stop for s in sl])
            in_block = np.all(
                (blobs[:, :3] >= lo - pad) & (blobs[:, :3] < hi + pad),
                axis=1)
            sub = blobs[in_block]
            if len(sub) < 2:
                continue
            matches = colocalize_blobs_match(
                sub, lo[::-1], (hi - lo)[::-1], tol, channels)
            for pair, bm in matches.items():
                if bm.df is None or not len(bm.df):
                    continue
                collected.setdefault(pair, []).append(bm.df)

        out = {}
        for pair, dfs in collected.items():
            df = pd.concat(dfs, ignore_index=True)
            # prune duplicate matches across blocks: same blob1 coords ->
            # keep shortest distance (reference :296-335)
            keys = df[BlobMatch.Cols.BLOB1.value].map(
                lambda b: tuple(np.round(np.asarray(b)[:3]).astype(int)))
            df = df.assign(_key=keys).sort_values(
                BlobMatch.Cols.DIST.value)
            df = df.drop_duplicates("_key").drop(columns="_key")
            out[pair] = BlobMatch(df=df.reset_index(drop=True))
        return out


def get_blobs_all(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Both blob sides as ``(blobs1, blobs2)`` or None
    (reference ``BlobMatch.get_blobs_all :121``)."""
    out = []
    for n in (1, 2):
        blobs = self.get_blobs(n)
        if blobs is None:
            return None
        out.append(blobs)
    return tuple(out)


BlobMatch.get_blobs_all = get_blobs_all
del get_blobs_all


def _get_roi_id(db, offset, shape, exp_name: str = "exp") -> int:
    """Whole-image ROI row for match persistence
    (reference ``colocalizer._get_roi_id :504``)."""
    exp_id = db.select_or_insert_experiment(exp_name)
    roi_id, _ = db.select_or_insert_roi(
        exp_id, 0, tuple(offset[::-1]), tuple(shape[::-1]))
    return roi_id


def insert_matches(db, matches: Dict, exp_name: str = "exp") -> None:
    """Persist channel-combo matches for a whole image under a
    zero-sized ROI (reference ``colocalizer.insert_matches :529``)."""
    roi_id = _get_roi_id(db, (0, 0, 0), (0, 0, 0), exp_name)
    for chl_matches in matches.values():
        blobs_all = chl_matches.get_blobs_all()
        if blobs_all is None:
            continue
        for blobs in blobs_all:
            db.insert_blobs(roi_id, blobs)
        rows = []
        for _, row in chl_matches.df.iterrows():
            rows.append((
                row[BlobMatch.Cols.BLOB1.value],
                row[BlobMatch.Cols.BLOB2.value],
                row[BlobMatch.Cols.DIST.value]))
        db.insert_blob_matches(roi_id, rows)


def select_matches(
        db, channels, offset=None, shape=None,
        exp_name: str = "exp") -> Optional[Dict]:
    """Load whole-image matches grouped per channel pair, rebuilding
    each side's blob row from its database ID
    (reference ``colocalizer.select_matches :550``)."""
    roi_id = _get_roi_id(
        db, offset or (0, 0, 0), shape or (0, 0, 0), exp_name)
    raw = db.select_blob_matches(roi_id)
    if not raw:
        return None

    def blob_by_id(bid):
        db.cur.execute(
            "SELECT z, y, x, radius, confirmed, truth, channel "
            "FROM blobs WHERE id = ?", (bid,))
        r = db.cur.fetchone()
        if r is None:
            return None
        return np.array([r["z"], r["y"], r["x"], r["radius"],
                         r["confirmed"], r["truth"], r["channel"]],
                        dtype=float)

    grouped: Dict[Tuple[int, int], list] = {}
    for b1_id, b2_id, dist in raw:
        b1 = blob_by_id(b1_id)
        b2 = blob_by_id(b2_id)
        if b1 is None or b2 is None:
            continue
        grouped.setdefault(
            (int(b1[6]), int(b2[6])), []).append((b1, b2, dist))
    return {pair: BlobMatch(matches)
            for pair, matches in grouped.items()} or None
