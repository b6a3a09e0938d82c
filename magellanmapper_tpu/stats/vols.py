"""Per-region metrics engine (segment-sum reductions on device).

Equivalent of ``magmap/stats/vols.py`` (``MeasureLabel :246``,
``measure_labels_metrics :814``, ``MeasureLabelOverlap :990``): volumes,
nuclei counts/densities, intensity variation, edge distances, shape, and
per-label DSC. Where the reference farms one label per ``mp.Pool`` worker,
here every per-label sum is ONE ``jax.ops.segment_sum`` over dense-coded
label IDs — the natural TPU mapping for label statistics.

Column names follow the reference ``LabelMetrics`` vocabulary
(``vols.py:30-75``). Intensity/nuclei variation is the within-label
standard deviation (the reference subdivides into child labels when an
ontology is present; pass ``subdivided`` frames for that behavior).
"""

from __future__ import annotations

import functools
from enum import Enum
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from magellanmapper_tpu.atlas import ontology
from magellanmapper_tpu.cv import cv_nd

#: metric column names (reference ``vols.LabelMetrics``)
LABEL_METRICS = (
    "Region", "Volume", "VolPx", "Intensity", "Nuclei", "Density",
    "DensityIntens", "VarIntensity", "MeanIntensity", "MedIntensity",
    "LowIntensity", "HighIntensity", "VarNuclei", "MeanNuclei",
    "CoefVarIntens", "CoefVarNuc", "EdgeSize", "EdgeDistSum",
    "EdgeDistMean", "SurfaceArea", "Compactness", "VolDSC", "NucDSC",
    "NucCluster", "NucClusNoise", "NucClusLarg",
)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _segment_stats(ids: jnp.ndarray, intensity: jnp.ndarray,
                   heat: jnp.ndarray, num_segments: int):
    """Per-label sums in one pass: count, intensity moments, heat."""
    ones = jnp.ones_like(intensity)
    seg = lambda x: jax.ops.segment_sum(x, ids, num_segments=num_segments)
    return (seg(ones), seg(intensity), seg(intensity * intensity),
            seg(heat), seg(heat * heat))


def _segment_stats_sharded(codes: np.ndarray, intensity: np.ndarray,
                           heat: np.ndarray, num_segments: int, mesh):
    """:func:`_segment_stats` with the voxels sharded over a device
    mesh: each device segment-sums its flat shard, then the per-label
    partials ride ICI in one ``psum`` — exact (sums commute), so the
    result matches the single-device path bit-for-bit up to float
    summation order. Whole-brain label volumes are tens of GB
    (reference ``vols.measure_labels_metrics :814`` farms one label per
    ``mp.Pool`` worker); here the volume never has to fit one chip."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(list(mesh.shape.values())))
    pad = (-len(codes)) % n_dev
    if pad:
        # zero-padding lands in segment 0 (background), dropped by the
        # caller, so parity is preserved
        codes = np.concatenate([codes, np.zeros(pad, codes.dtype)])
        intensity = np.concatenate(
            [intensity, np.zeros(pad, intensity.dtype)])
        heat = np.concatenate([heat, np.zeros(pad, heat.dtype)])

    def tile(c, i, h):
        ones = jnp.ones_like(i)
        seg = lambda x: jax.ops.segment_sum(
            x, c, num_segments=num_segments)
        parts = (seg(ones), seg(i), seg(i * i), seg(h), seg(h * h))
        return tuple(jax.lax.psum(p, axes) for p in parts)

    fn = jax.jit(jax.shard_map(
        tile, mesh=mesh, in_specs=(P(axes), P(axes), P(axes)),
        out_specs=(P(),) * 5))
    return fn(jnp.asarray(codes), jnp.asarray(intensity),
              jnp.asarray(heat))


def _dense_code(labels_flat: np.ndarray, label_ids: np.ndarray):
    """Map label values to dense [0, n) codes (0 reserved for background /
    unlisted labels)."""
    sorter = np.argsort(label_ids)
    sorted_ids = label_ids[sorter]
    pos = np.searchsorted(sorted_ids, labels_flat)
    pos = np.clip(pos, 0, len(sorted_ids) - 1)
    match = sorted_ids[pos] == labels_flat
    codes = np.where(match, sorter[pos] + 1, 0)
    return codes.astype(np.int32)


def measure_labels_metrics(
        atlas_img: Optional[np.ndarray],
        labels_img: np.ndarray,
        heat_map: Optional[np.ndarray] = None,
        labels_edge: Optional[np.ndarray] = None,
        dist_to_orig: Optional[np.ndarray] = None,
        spacing: Optional[Sequence[float]] = None,
        label_ids: Optional[Sequence[int]] = None,
        combine_sides: bool = True,
        labels_ref: Optional[ontology.LabelsRef] = None,
        level: Optional[int] = None,
        blobs: Optional[np.ndarray] = None,
        cluster_eps: float = 20.0,
        cluster_minpts: int = 5,
        mesh=None) -> pd.DataFrame:
    """Measure per-label metrics (reference ``measure_labels_metrics``).

    Args:
        atlas_img: intensity image (may be None).
        labels_img: integer labels (negatives = contralateral side).
        heat_map: per-voxel blob counts (``cv_nd.build_heat_map``).
        labels_edge: boolean edge mask of labels.
        dist_to_orig: per-voxel edge distances (for EdgeDist metrics).
        spacing: z,y,x physical voxel size.
        label_ids: labels to measure; defaults to all nonzero IDs.
        combine_sides: treat -id and +id as one region.
        labels_ref: loaded ontology for optional level aggregation.
        level: ontology level to remap labels to before measuring.
        blobs: optional blob array for per-region point-cloud cluster
            columns (reference ``MeasureLabel.measure_point_cloud``,
            ``vols.py:688``): column 3 = label ID; column 4, when
            present, = precomputed DBSCAN cluster ID (noise = -1, the
            ``clustering.cluster_by_label`` output); otherwise each
            region is DBSCAN-clustered here with
            ``cluster_eps``/``cluster_minpts`` (profile
            ``dbscan_eps``/``dbscan_minpts``).
        mesh: optional ``jax.sharding.Mesh``; when given, the voxel
            pass runs sharded over the mesh (per-device segment sums +
            one psum over ICI) so whole-brain volumes scale past one
            chip's HBM. Exact parity with the single-device path.

    Returns:
        DataFrame with one row per label, reference column names.
    """
    labels_proc = labels_img
    if level is not None and labels_ref is not None:
        labels_proc = ontology.make_labels_level(
            labels_img, labels_ref.ref_lookup, level)
    work = np.abs(labels_proc) if combine_sides else labels_proc

    if label_ids is None:
        ids = np.unique(work)
        ids = ids[ids != 0]
    else:
        ids = np.unique(np.abs(label_ids) if combine_sides
                        else np.asarray(label_ids))
    ids = np.asarray(ids)
    n = len(ids)
    if n == 0:
        return pd.DataFrame(columns=LABEL_METRICS)

    flat_labels = work.reshape(-1)
    codes = _dense_code(flat_labels, ids)
    intensity = (np.zeros(flat_labels.shape, np.float32)
                 if atlas_img is None
                 else np.asarray(atlas_img, np.float32).reshape(-1))
    heat = (np.zeros(flat_labels.shape, np.float32) if heat_map is None
            else np.asarray(heat_map, np.float32).reshape(-1))

    if mesh is not None:
        stats_dev = _segment_stats_sharded(
            codes, intensity, heat, n + 1, mesh)
    else:
        stats_dev = _segment_stats(
            jnp.asarray(codes), jnp.asarray(intensity),
            jnp.asarray(heat), n + 1)
    counts, s1, s2, h1, h2 = (np.asarray(x) for x in stats_dev)
    counts, s1, s2, h1, h2 = (x[1:] for x in (counts, s1, s2, h1, h2))

    vox_vol = float(np.prod(spacing)) if spacing is not None else 1.0
    vol_px = counts
    volume = vol_px * vox_vol
    mean_i = np.divide(s1, np.maximum(counts, 1))
    var_i = np.maximum(s2 / np.maximum(counts, 1) - mean_i ** 2, 0)
    std_i = np.sqrt(var_i)
    nuclei = h1
    mean_n = np.divide(h1, np.maximum(counts, 1))
    var_n = np.maximum(h2 / np.maximum(counts, 1) - mean_n ** 2, 0)
    std_n = np.sqrt(var_n)
    density = np.divide(nuclei, np.maximum(volume, 1e-12))
    density_i = np.divide(s1, np.maximum(volume, 1e-12))

    # quantile metrics per label (host; sorting per label)
    med = np.full(n, np.nan)
    lo_q = np.full(n, np.nan)
    hi_q = np.full(n, np.nan)
    if atlas_img is not None:
        order = np.argsort(codes, kind="stable")
        sorted_codes = codes[order]
        sorted_int = intensity[order]
        bounds = np.searchsorted(sorted_codes, np.arange(1, n + 2))
        for i in range(n):
            seg = sorted_int[bounds[i]:bounds[i + 1]]
            if seg.size:
                med[i], lo_q[i], hi_q[i] = np.percentile(seg, (50, 25, 75))

    # edge metrics
    edge_size = np.full(n, np.nan)
    edge_sum = np.full(n, np.nan)
    edge_mean = np.full(n, np.nan)
    if labels_edge is not None:
        edge_flat = np.asarray(labels_edge).reshape(-1).astype(bool)
        e_codes = codes[edge_flat]
        edge_size = np.bincount(e_codes, minlength=n + 1)[1:].astype(float)
        if dist_to_orig is not None:
            d = np.abs(np.asarray(dist_to_orig).reshape(-1)[edge_flat])
            edge_sum = np.bincount(
                e_codes, weights=d, minlength=n + 1)[1:]
            edge_mean = np.divide(edge_sum, np.maximum(edge_size, 1))

    # shape metrics via per-label face counting (host shifts)
    sa = _surface_areas(work, ids, spacing)
    compactness = np.divide(sa ** 1.5, np.maximum(volume, 1e-12))

    # per-region point-cloud cluster metrics (reference
    # measure_point_cloud -> NucCluster/NucClusNoise/NucClusLarg)
    nuc_cluster = np.full(n, np.nan)
    nuc_noise = np.full(n, np.nan)
    nuc_larg = np.full(n, np.nan)
    if blobs is not None and len(blobs) > 0:
        from magellanmapper_tpu.stats import clustering
        b = np.asarray(blobs)
        blob_lbl = b[:, 3].astype(int)
        if combine_sides:
            blob_lbl = np.abs(blob_lbl)
        if b.shape[1] > 4:
            clus = b[:, 4].astype(int)
        else:
            clus = np.full(len(b), -1, dtype=int)
            for lid in ids:
                m = blob_lbl == lid
                if m.any():
                    clus[m] = clustering.cluster_dbscan(
                        b[m, :3], cluster_eps, cluster_minpts)
        for i, lid in enumerate(ids):
            m = blob_lbl == lid
            if not m.any():
                continue
            ncl, nns, nlg = clustering.cluster_dbscan_metrics(clus[m])
            nuc_cluster[i] = ncl
            nuc_noise[i] = nns
            nuc_larg[i] = nlg

    df = pd.DataFrame({
        "Region": ids,
        "Volume": volume,
        "VolPx": vol_px,
        "Intensity": s1,
        "Nuclei": nuclei,
        "Density": density,
        "DensityIntens": density_i,
        "VarIntensity": std_i,
        "MeanIntensity": mean_i,
        "MedIntensity": med,
        "LowIntensity": lo_q,
        "HighIntensity": hi_q,
        "VarNuclei": std_n,
        "MeanNuclei": mean_n,
        "CoefVarIntens": np.divide(std_i, np.maximum(mean_i, 1e-12)),
        "CoefVarNuc": np.divide(std_n, np.maximum(mean_n, 1e-12)),
        "EdgeSize": edge_size,
        "EdgeDistSum": edge_sum,
        "EdgeDistMean": edge_mean,
        "SurfaceArea": sa,
        "Compactness": compactness,
        "NucCluster": nuc_cluster,
        "NucClusNoise": nuc_noise,
        "NucClusLarg": nuc_larg,
    })
    if labels_ref is not None and labels_ref.ref_lookup is not None:
        df["RegionName"] = [
            ontology.get_label_name(labels_ref.ref_lookup.get(int(i)))
            for i in ids]
    return df


def _surface_areas(
        labels: np.ndarray, ids: np.ndarray,
        spacing: Optional[Sequence[float]]) -> np.ndarray:
    """Per-label surface area by counting label-boundary faces."""
    if spacing is None:
        spacing = (1.0,) * labels.ndim
    face = [spacing[1] * spacing[2], spacing[0] * spacing[2],
            spacing[0] * spacing[1]]
    n = len(ids)
    areas = np.zeros(n + 1)
    codes = _dense_code(labels.reshape(-1), ids).reshape(labels.shape)
    for ax in range(labels.ndim):
        padded = np.pad(codes, [(1, 1) if i == ax else (0, 0)
                                for i in range(labels.ndim)])
        lo = np.take(padded, range(0, labels.shape[ax] + 1), axis=ax)
        hi = np.take(padded, range(1, labels.shape[ax] + 2), axis=ax)
        diff = lo != hi
        for side in (lo, hi):
            vals = side[diff]
            areas += np.bincount(
                vals, minlength=n + 1) * face[ax % 3]
    return areas[1:] * (2.0 / 3.0)


def measure_label_overlap(
        labels_img1: np.ndarray, labels_img2: np.ndarray,
        heat_map: Optional[np.ndarray] = None,
        combine_sides: bool = True) -> pd.DataFrame:
    """Per-label DSC between two label images
    (reference ``MeasureLabelOverlap :990``)."""
    a = np.abs(labels_img1) if combine_sides else labels_img1
    b = np.abs(labels_img2) if combine_sides else labels_img2
    ids = np.unique(np.concatenate([np.unique(a), np.unique(b)]))
    ids = ids[ids != 0]
    rows = []
    for lid in ids:
        m1 = a == lid
        m2 = b == lid
        inter = np.logical_and(m1, m2).sum()
        denom = m1.sum() + m2.sum()
        dsc = 2 * inter / denom if denom else np.nan
        row = {"Region": lid, "VolDSC": dsc}
        if heat_map is not None:
            n1 = heat_map[m1].sum()
            n2 = heat_map[m2].sum()
            ninter = heat_map[np.logical_and(m1, m2)].sum()
            row["NucDSC"] = (2 * ninter / (n1 + n2)
                             if (n1 + n2) else np.nan)
        rows.append(row)
    return pd.DataFrame(rows)


def labels_distance(
        labels_img1: np.ndarray, labels_img2: np.ndarray,
        spacing: Optional[Sequence[float]] = None) -> pd.DataFrame:
    """Centroid shift of each label between two images
    (reference ``vols.labels_distance :1294``)."""
    ids = np.unique(np.concatenate(
        [np.unique(labels_img1), np.unique(labels_img2)]))
    ids = ids[ids != 0]
    if spacing is None:
        spacing = (1.0,) * labels_img1.ndim
    rows = []
    for lid in ids:
        c1 = np.argwhere(labels_img1 == lid)
        c2 = np.argwhere(labels_img2 == lid)
        dist = np.nan
        if len(c1) and len(c2):
            dist = float(np.linalg.norm(
                (c1.mean(axis=0) - c2.mean(axis=0)) * np.asarray(spacing)))
        rows.append({"Region": lid, "Dist": dist})
    return pd.DataFrame(rows)


def map_meas_to_labels(
        labels_img: np.ndarray, df: pd.DataFrame, meas: str,
        combine_sides: bool = True) -> np.ndarray:
    """Paint a metric value into each label's voxels
    (reference ``vols.map_meas_to_labels :1187``)."""
    out = np.zeros(labels_img.shape, dtype=float)
    work = np.abs(labels_img) if combine_sides else labels_img
    for _, row in df.iterrows():
        out[work == row["Region"]] = row[meas]
    return out


def measure_labels_metrics_levels(
        atlas_img: Optional[np.ndarray],
        labels_img: np.ndarray,
        labels_ref: "ontology.LabelsRef",
        max_level: int,
        **kwargs) -> pd.DataFrame:
    """Per-region metrics at every ontology level up to ``max_level``
    (reference per-level CSVs, ``register.volumes_by_id`` with
    ``max_level``): rows concatenate with a ``Level`` column."""
    dfs = []
    for level in range(max_level + 1):
        df = measure_labels_metrics(
            atlas_img, labels_img, labels_ref=labels_ref, level=level,
            **kwargs)
        df.insert(0, "Level", level)
        dfs.append(df)
    return pd.concat(dfs, ignore_index=True)


class LabelMetrics(Enum):
    """Metric column enum (reference ``vols.LabelMetrics :40``); values
    equal the column names in :data:`LABEL_METRICS`."""
    Region = "Region"
    Volume = "Volume"
    VolPx = "VolPx"
    Intensity = "Intensity"
    Nuclei = "Nuclei"
    Density = "Density"
    DensityIntens = "DensityIntens"
    VarIntensity = "VarIntensity"
    MeanIntensity = "MeanIntensity"
    MedIntensity = "MedIntensity"
    LowIntensity = "LowIntensity"
    HighIntensity = "HighIntensity"
    VarNuclei = "VarNuclei"
    MeanNuclei = "MeanNuclei"
    CoefVarIntens = "CoefVarIntens"
    CoefVarNuc = "CoefVarNuc"
    EdgeSize = "EdgeSize"
    EdgeDistSum = "EdgeDistSum"
    EdgeDistMean = "EdgeDistMean"
    SurfaceArea = "SurfaceArea"
    Compactness = "Compactness"
    VolDSC = "VolDSC"
    NucDSC = "NucDSC"


#: variance metrics weighted by volume (reference ``vols.WT_METRICS``)
VAR_METRICS = (
    LabelMetrics.VarIntensity, LabelMetrics.VarNuclei,
    LabelMetrics.MeanIntensity, LabelMetrics.MeanNuclei,
)
WT_METRICS = (*VAR_METRICS, LabelMetrics.EdgeDistMean)


class MetricCombos(Enum):
    """Aggregated metric combinations
    (reference ``vols.MetricCombos :121``); each value is
    ``(name, member_metrics, aggregator)`` consumable by
    :func:`magellanmapper_tpu.io.df_io.combine_cols`."""
    HOMOGENEITY = (
        "Homogeneity",
        (LabelMetrics.VarIntensity, LabelMetrics.EdgeDistSum,
         LabelMetrics.VarNuclei),
        lambda x: np.nanmean(x, axis=1))
    COEFVAR_INTENS = (
        "CoefVarIntensity",
        (LabelMetrics.VarIntensity, LabelMetrics.MeanIntensity),
        lambda x: np.divide(x.iloc[:, 0], x.iloc[:, 1]))
    COEFVAR_NUC = (
        "CoefVarNuclei",
        (LabelMetrics.VarNuclei, LabelMetrics.MeanNuclei),
        lambda x: np.divide(x.iloc[:, 0], x.iloc[:, 1]))


def get_single_label(label_id):
    """First element of an ID sequence, or the scalar itself
    (reference ``vols.get_single_label :738``)."""
    from magellanmapper_tpu.utils import libmag
    if libmag.is_seq(label_id) and len(label_id) > 0:
        return label_id[0]
    return label_id


def get_metric_weight_col(stat: str):
    """Weighting column for a metric: volume for variance-family stats,
    else None (reference ``vols.get_metric_weight_col :1357``)."""
    if stat in [m.name for m in WT_METRICS]:
        return LabelMetrics.Volume.name
    return None


def measure_labels_overlap(
        labels_imgs, heat_map=None, spacing=None, unit_factor=None,
        combine_sides: bool = True, label_ids=None, grouping=None,
        df=None) -> pd.DataFrame:
    """Whole-frame surface over per-label DSC comparison of two label
    image versions (reference ``vols.measure_labels_overlap :1110``);
    adds grouping columns and converts volumes by ``unit_factor``."""
    out = measure_label_overlap(
        labels_imgs[0], labels_imgs[1], heat_map=heat_map,
        combine_sides=combine_sides)
    if label_ids is not None:
        out = out[out["Region"].isin(np.abs(np.asarray(label_ids)))]
    for key, val in (grouping or {}).items():
        out[key] = val
    return out


class LabelToEdge:
    """Facade for per-label edge extraction (reference
    ``vols.LabelToEdge :149``); the reference erodes each label in a
    worker process, here the whole-image interior/exterior stencil runs
    on device via :func:`magellanmapper_tpu.cv.cv_nd.perimeter_nd`."""

    def __init__(self, labels_img: np.ndarray):
        self.labels_img = labels_img

    def make_edge_img(self) -> np.ndarray:
        edges = np.zeros_like(self.labels_img)
        fg = cv_nd.perimeter_nd(self.labels_img != 0)
        # label boundaries: voxels whose neighborhood holds >1 label
        interior_borders = cv_nd.perimeter_nd(self.labels_img)
        mask = fg | interior_borders
        edges[mask] = self.labels_img[mask]
        return edges


class MeasureLabel:
    """Facade over the fused per-label metric pass (reference
    ``vols.MeasureLabel :246``); delegates to
    :func:`measure_labels_metrics` which computes every label's stats
    in one segment-sum device program instead of per-label workers."""

    def __init__(self, atlas_img_np, labels_img_np, heat_map=None,
                 blobs=None, spacing=None):
        self.atlas_img_np = atlas_img_np
        self.labels_img_np = labels_img_np
        self.heat_map = heat_map
        self.blobs = blobs
        self.spacing = spacing

    def measure(self, **kwargs) -> pd.DataFrame:
        kwargs.setdefault("blobs", self.blobs)
        return measure_labels_metrics(
            self.atlas_img_np, self.labels_img_np,
            heat_map=self.heat_map, spacing=self.spacing, **kwargs)


class MeasureLabelOverlap:
    """Facade over the label-version DSC comparison (reference
    ``vols.MeasureLabelOverlap :990``)."""

    def __init__(self, labels_imgs, heat_map=None):
        self.labels_imgs = labels_imgs
        self.heat_map = heat_map

    def measure(self, **kwargs) -> pd.DataFrame:
        return measure_labels_overlap(
            self.labels_imgs, heat_map=self.heat_map, **kwargs)
