"""Image import: TIFF/RAW/plane-directory -> memmapped image5d.

Equivalent of ``magmap/io/importer.py``: ``import_multiplane_images
:1039`` (plane-wise streaming into an ``open_memmap`` output),
``setup_import_multipage :830``, ``setup_import_dir :1245``,
``deconstruct_img_name :328`` (offset/size parsing from filenames), and
intensity-bound measurement. Bioformats/Java is not available; TIFF goes
through the self-contained ``io.tiff`` codec and RAW through dtype/shape
metadata.
"""

from __future__ import annotations

import glob
import logging
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.io import np_io, tiff

_logger = logging.getLogger(__name__)


def deconstruct_img_name(
        img_name: str) -> Tuple[str, Optional[List[int]],
                                Optional[List[int]]]:
    """Parse sub-image offset/size from a filename
    (reference ``deconstruct_img_name :328``): names like
    ``base_(x,y,z)x(x,y,z)`` carry offset x size."""
    base = os.path.basename(img_name)
    m = re.search(
        r"_\((\d+),(\d+),(\d+)\)x\((\d+),(\d+),(\d+)\)", base)
    if not m:
        return img_name, None, None
    vals = [int(v) for v in m.groups()]
    stripped = img_name.replace(m.group(0), "")
    return stripped, vals[:3], vals[3:]


def make_subimage_name(
        base: str, offset: Sequence[int], size: Sequence[int]) -> str:
    """Sub-image path naming with x,y,z-ordered tuples; thin wrapper over
    ``io.naming.make_subimage_name`` (which speaks z,y,x per the
    reference)."""
    from magellanmapper_tpu.io import naming
    return naming.make_subimage_name(
        base, tuple(offset)[::-1], tuple(size)[::-1])


def parse_ome_description(desc: Optional[str]) -> Optional[Dict]:
    """Parse an OME-TIFF ImageDescription's OME-XML block.

    Returns ``{"size": {X,Y,Z,C,T}, "order": DimensionOrder,
    "resolutions": (z,y,x) | None}`` or None for non-OME descriptions.
    The reference gets this through Bioformats' OME metadata store
    (``importer.parse_ome``/``parse_ome_raw``, ``importer.py:129+``).
    """
    if not desc or "OME" not in desc or "<" not in desc:
        return None
    import xml.etree.ElementTree as ET
    try:
        root = ET.fromstring(desc)
    except ET.ParseError:
        return None

    def local(el):
        return el.tag.rsplit("}", 1)[-1]

    pixels = next((el for el in root.iter() if local(el) == "Pixels"),
                  None)
    if pixels is None:
        return None
    size = {ax: int(pixels.get(f"Size{ax}", 1)) for ax in "XYZCT"}
    phys = {}
    for ax in "XYZ":
        v = pixels.get(f"PhysicalSize{ax}")
        if v is not None:
            phys[ax] = float(v)
    res = None
    if "X" in phys and "Y" in phys:
        res = (phys.get("Z", phys["X"]), phys["Y"], phys["X"])
    return {"size": size,
            "order": pixels.get("DimensionOrder", "XYZCT"),
            "resolutions": res}


def _reshape_ome(pages: np.ndarray, ome: Dict) -> np.ndarray:
    """(pages, H, W) -> (T, Z, Y, X[, C]) per the OME DimensionOrder
    (the first two letters are always XY; the rest order C/Z/T fastest
    first across pages)."""
    size = ome["size"]
    nz, nc, nt = size["Z"], size["C"], size["T"]
    if pages.shape[0] != nz * nc * nt:
        raise ValueError(
            f"OME page count mismatch: {pages.shape[0]} pages vs "
            f"SizeZ*SizeC*SizeT = {nz * nc * nt}")
    fast_to_slow = [ax for ax in ome["order"][2:] if ax in "ZCT"]
    dims = {"Z": nz, "C": nc, "T": nt}
    # page index unravels as (slowest, ..., fastest)
    arr = pages.reshape(
        [dims[ax] for ax in reversed(fast_to_slow)]
        + list(pages.shape[1:]))
    # move axes into (T, Z, Y, X, C)
    axis_of = {ax: i for i, ax in enumerate(reversed(fast_to_slow))}
    arr = np.transpose(arr, (
        axis_of["T"], axis_of["Z"], 3, 4, axis_of["C"]))
    if size["C"] == 1:
        arr = arr[..., 0]
    return arr


def import_tiff(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None,
        channel_dim: Optional[int] = None) -> np_io.Image5d:
    """Import a (multi-page) TIFF stack into a memmapped image5d.

    OME-TIFFs (an OME-XML ImageDescription) reshape their page stream
    into the full ``(T, Z, Y, X[, C])`` geometry with calibration from
    PhysicalSize attributes — the Bioformats metadata path
    (reference ``importer.py:129``) done natively.
    """
    arr, desc = tiff.read_tiff(path, return_description=True)
    if arr.ndim == 2:
        arr = arr[None]
    ome = parse_ome_description(desc)
    if ome is not None and arr.ndim == 3:
        arr5d = _reshape_ome(arr, ome)
        res = resolutions or ome.get("resolutions")
        return np_io.write_npy(
            out_path or path, arr5d,
            resolutions=([list(res)] if res is not None else None))
    if channel_dim is not None and arr.ndim == 3:
        pass  # single-channel stack
    out_path = out_path or path
    return np_io.write_npy(
        out_path, arr[None], resolutions=(
            [list(resolutions)] if resolutions is not None else None))


def import_czi(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import a Zeiss CZI file into a memmapped image5d via the pure-
    Python ZISRAW reader (``io.czi_lif``) — the JVM/Bioformats path the
    reference uses (``importer.py:97-156``) is unavailable here."""
    from magellanmapper_tpu.io import czi_lif
    arr, meta = czi_lif.read_czi(path)
    res = resolutions or meta.get("resolutions")
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_lif(
        path: str, out_path: Optional[str] = None, series: int = 0,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import one series of a Leica LIF file into a memmapped image5d
    (pure-Python reader, ``io.czi_lif``)."""
    from magellanmapper_tpu.io import czi_lif
    arr, meta = czi_lif.read_lif(path, series=series)
    res = resolutions or meta.get("resolutions")
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_nd2(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import a Nikon ND2 file into a memmapped image5d via the pure-
    Python chunk-map reader (``io.nd2``) — the JVM/Bioformats path the
    reference uses (``importer.py:97-156,1127``) is unavailable here.
    Compressed planes and legacy pre-chunk-map files stay gated."""
    from magellanmapper_tpu.io import nd2
    arr, meta = nd2.read_nd2(path)
    res = resolutions or meta.get("resolutions")
    if arr.ndim == 4:        # (C, Z, Y, X) -> (Z, Y, X, C)
        arr = np.moveaxis(arr, 0, -1)
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_oib(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import an Olympus OIB archive (OLE2 compound file of per-plane
    TIFFs) via the pure-Python reader (``io.oib``)."""
    from magellanmapper_tpu.io import oib
    arr, meta = oib.read_oib(path)
    res = resolutions or meta.get("resolutions")
    if arr.ndim == 4:        # (C, Z, Y, X) -> (Z, Y, X, C)
        arr = np.moveaxis(arr, 0, -1)
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_oif(
        path: str, out_path: Optional[str] = None,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import an Olympus OIF main file + ``.files`` plane directory
    via the pure-Python reader (``io.oib``)."""
    from magellanmapper_tpu.io import oib
    arr, meta = oib.read_oif(path)
    res = resolutions or meta.get("resolutions")
    if arr.ndim == 4:
        arr = np.moveaxis(arr, 0, -1)
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_ims(
        path: str, out_path: Optional[str] = None,
        resolution_level: int = 0,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import an Imaris IMS (HDF5) volume via the pure-Python
    restricted HDF5 reader (``io.hdf5``): symbol-table groups,
    contiguous/chunked + gzip/shuffle storage — the profile libhdf5
    defaults (and hence Imaris writers) emit. libhdf5-'latest' files
    (v2 object headers) fall back to the system libhdf5 through
    ctypes (``io.hdf5_native``) when the library is present."""
    from magellanmapper_tpu.io import hdf5
    arr, meta = hdf5.read_ims(path, resolution_level=resolution_level)
    res = resolutions or meta.get("resolutions")
    if arr.ndim == 4:        # (C, Z, Y, X) -> (Z, Y, X, C)
        arr = np.moveaxis(arr, 0, -1)
    return np_io.write_npy(
        out_path or path, arr[None],
        resolutions=([list(res)] if res is not None else None))


def import_raw(
        path: str, shape: Sequence[int], dtype,
        out_path: Optional[str] = None,
        offset_bytes: int = 0,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Import a headerless RAW volume given shape (z,y,x[,c]) + dtype."""
    count = int(np.prod(shape))
    arr = np.memmap(
        path, dtype=dtype, mode="r", offset=offset_bytes, shape=tuple(shape))
    out_path = out_path or path
    return np_io.write_npy(
        out_path, np.asarray(arr)[None], resolutions=(
            [list(resolutions)] if resolutions is not None else None))


def setup_import_dir(dir_path: str, pattern: str = "*.tif*") -> List[str]:
    """Sorted plane files in a directory
    (reference ``setup_import_dir :1245``)."""
    files = sorted(glob.glob(os.path.join(dir_path, pattern)))
    if not files:
        raise FileNotFoundError(
            f"no files matching {pattern} in {dir_path}")
    return files


def import_planes_to_stack(
        plane_files: Sequence[str], out_path: str,
        resolutions: Optional[Sequence[float]] = None) -> np_io.Image5d:
    """Stream per-plane images into a memmapped image5d
    (reference ``import_planes_to_stack :1295`` /
    ``import_multiplane_images :1039``)."""
    first = tiff.read_tiff(plane_files[0])
    if first.ndim > 2:
        first = first[0]
    shape = (1, len(plane_files)) + first.shape
    path_img, path_meta = np_io.make_filenames(out_path)
    out = np.lib.format.open_memmap(
        path_img, mode="w+", dtype=first.dtype, shape=shape)
    out[0, 0] = first
    for i, fname in enumerate(plane_files[1:], start=1):
        plane = tiff.read_tiff(fname)
        if plane.ndim > 2:
            plane = plane[0]
        out[0, i] = plane
    out.flush()
    near_min, near_max = np_io.calc_intensity_bounds(out)
    np_io.save_image_info(
        path_meta, [os.path.basename(out_path)], [shape],
        [list(resolutions)] if resolutions is not None else [[1.0, 1.0, 1.0]],
        near_min=near_min, near_max=near_max)
    return np_io.read_file(out_path)


def read_file(filename: str, series: Optional[int] = None,
              **kwargs) -> np_io.Image5d:
    """Load an imported image (reference ``importer.read_file :747``)."""
    return np_io.read_file(filename, series, **kwargs)


#: per-channel file designator (reference ``importer.CHANNEL_SEPARATOR``)
CHANNEL_SEPARATOR = "_ch_"


def filename_to_base(filename: str, series: Optional[int] = None,
                     modifier: str = "", keep_ext: bool = False) -> str:
    """Image path to its MagellanMapper base path
    (reference ``importer.filename_to_base :304``)."""
    from magellanmapper_tpu.utils import libmag
    base = filename if keep_ext else libmag.splitext(filename)[0]
    if modifier:
        base += f"_{modifier}" if not modifier.startswith("_") else modifier
    return base


def parse_deconstructed_name(filename: str, offset, size,
                             reg_suffixes=None, suffix=None):
    """Interpret a deconstructed name: returns
    ``(has_subimg, is_registered)``
    (reference ``importer.parse_deconstructed_name :432``)."""
    has_subimg = offset is not None and size is not None
    is_registered = bool(reg_suffixes) and any(
        v for v in (reg_suffixes or {}).values())
    return has_subimg, is_registered


def find_sizes(filename: str) -> List[Tuple[int, ...]]:
    """Per-series (t, z, y, x, c) dimensions of an image file
    (reference ``importer.find_sizes :242``; the reference reads OME
    metadata via Bioformats — here TIFF/NPY headers directly)."""
    from magellanmapper_tpu.io import tiff as tiff_mod
    ext = os.path.splitext(filename)[1].lower()
    if ext in (".tif", ".tiff"):
        arr = tiff_mod.read_tiff(filename)
        shape = arr.shape
    else:
        arr = np.load(filename, mmap_mode="r")
        shape = arr.shape
    # normalize to t,z,y,x,c
    shape = list(shape)
    while len(shape) < 5:
        if len(shape) == 3:
            shape = [1] + shape
        else:
            shape = shape + [1]
    return [tuple(shape[:5])]


def setup_import_multipage(filename) -> Tuple[Dict, str]:
    """Group channel-designated files (``*_ch_<n>*``) for import
    (reference ``importer.setup_import_multipage :830``)."""
    import glob as glob_mod
    from collections import OrderedDict
    paths = np.atleast_1d(filename).tolist()
    base = paths[0]
    root, ext = os.path.splitext(base)
    # strip an existing channel designator to glob for siblings
    i = root.find(CHANNEL_SEPARATOR)
    prefix = root[:i] if i != -1 else root
    matches = sorted(glob_mod.glob(
        f"{prefix}{CHANNEL_SEPARATOR}*{ext}"))
    chl_paths: Dict = OrderedDict()
    if matches:
        for m in matches:
            tail = m[len(prefix) + len(CHANNEL_SEPARATOR):]
            try:
                chl = int(os.path.splitext(tail)[0].split("_")[0])
            except ValueError:
                continue
            chl_paths.setdefault(chl, []).append(m)
    else:
        chl_paths[0] = paths
    return chl_paths, prefix


def setup_import_metadata(chl_paths: Dict, channel=None, series=None,
                          z_max: int = -1) -> Dict:
    """Output shape + dtype metadata for a multipage import
    (reference ``importer.setup_import_metadata :930``)."""
    from magellanmapper_tpu.io import tiff as tiff_mod
    md: Dict = {"series": series or 0}
    chls = [c for c in chl_paths
            if channel is None or c in np.atleast_1d(channel)]
    shape = None
    dtype = None
    for chl in chls:
        arr = tiff_mod.read_tiff(chl_paths[chl][0])
        if arr.ndim == 2:
            arr = arr[None]
        if z_max >= 0:
            arr = arr[:z_max]
        shape = arr.shape
        dtype = arr.dtype
        break
    if shape is not None:
        md["shape"] = (1, *shape, len(chls)) if len(chls) > 1 \
            else (1, *shape)
        md["dtype"] = str(dtype)
    return md


def import_multiplane_images(chl_paths: Dict, prefix: str,
                             import_md: Optional[Dict] = None,
                             channel=None) -> "np_io.Image5d":
    """Import channel-grouped multipage files into one image5d archive
    (reference ``importer.import_multiplane_images :1039``)."""
    from magellanmapper_tpu.io import tiff as tiff_mod
    vols = []
    for chl, paths in sorted(chl_paths.items()):
        if channel is not None and chl not in np.atleast_1d(channel):
            continue
        planes = [tiff_mod.read_tiff(p) for p in paths]
        vol = planes[0] if len(planes) == 1 else np.stack(
            [p if p.ndim == 2 else p[0] for p in planes])
        if vol.ndim == 2:
            vol = vol[None]
        vols.append(vol)
    arr = vols[0] if len(vols) == 1 else np.stack(vols, axis=-1)
    return np_io.write_npy(prefix, arr[None])


def calc_near_intensity_bounds(near_mins: list, near_maxs: list,
                               lows: list, highs: list) -> None:
    """Fold per-chunk low/high lists into channel near-min/max lists,
    in place (reference ``importer.calc_near_intensity_bounds
    :1447``)."""
    if not lows:
        return
    num_channels = len(np.atleast_1d(lows[0]))
    if num_channels <= 1:
        near_mins.append(float(np.min(lows)))
        near_maxs.append(float(np.max(highs)))
    else:
        near_mins.extend(np.min(np.asarray(lows), axis=0).tolist())
        near_maxs.extend(np.max(np.asarray(highs), axis=0).tolist())


def save_np_image(image: np.ndarray, filename: str,
                  series: Optional[int] = None) -> str:
    """Save an array as an image5d archive + metadata
    (reference ``importer.save_np_image :1471``)."""
    if image.ndim < 4:
        image = image[None]
    base = filename_to_base(filename, series)
    np_io.write_npy(base, image)
    return base


def calc_scaling(image5d, scaled, image5d_shape=None,
                 scaled_shape=None) -> np.ndarray:
    """Exact z,y,x scaling between an image and its rescaled version
    (reference ``importer.calc_scaling :1500``)."""
    if image5d_shape is None:
        image5d_shape = image5d.shape
    if scaled_shape is None:
        scaled_shape = scaled.shape
    big = image5d_shape[1:4] if len(image5d_shape) >= 4 \
        else image5d_shape[:3]
    small = scaled_shape[1:4] if len(scaled_shape) >= 4 \
        else scaled_shape[:3]
    return np.divide(small, big)


def roi_to_image5d(roi: np.ndarray) -> np.ndarray:
    """Add the time axis (reference ``importer.roi_to_image5d
    :1537``)."""
    return np.asarray(roi)[None]


def assign_metadata(img5d, md: Dict) -> None:
    """Copy metadata entries onto an Image5d
    (reference ``importer.assign_metadata :671``)."""
    for key in ("resolutions", "magnification", "zoom", "near_min",
                "near_max"):
        if key in md and md[key] is not None:
            setattr(img5d, key, md[key])


# -- Bioformats/JVM surface (Java unavailable: honest gating) -------------
#
# Format support matrix (reference ``importer.py:97-156,1127`` imports
# proprietary formats through Bioformats; this environment has no JVM):
#
# | Format                         | Here                | Path           |
# |--------------------------------|---------------------|----------------|
# | NumPy .npy / image5d archives  | yes (memmap)        | np_io          |
# | TIFF (uncompressed strips)     | yes (lazy memmap)   | io.tiff        |
# | TIFF (deflate/LZW/PackBits)    | yes (lazy decode)   | io.tiff        |
# | OME-TIFF (5D geometry + cal.)  | yes (native OME-XML)| import_tiff    |
# | BigTIFF                        | yes (read)          | io.tiff        |
# | RAW + sidecar metadata         | yes                 | import_raw     |
# | Plane-per-file directories     | yes                 | import_dir     |
# | MHD/MHA, NRRD, NIfTI           | yes                 | io.sitk_io     |
# | CZI (uncompressed/zlib/zstd)   | yes (pure Python)   | io.czi_lif     |
# | CZI (JPEG subblocks)           | yes (native shim    | io.czi_lif +   |
# |                                |  over sys libjpeg)  | native/jpegcodec|
# | LIF                            | yes (pure Python)   | io.czi_lif     |
# | ND2 (chunk-map, uncompressed)  | yes (pure Python)   | io.nd2         |
# | ND2 (legacy JP2 container)     | yes (ctypes system  | io.nd2 +       |
# |                                |  libopenjp2)        | io.jp2k        |
# | OIB (OLE2) / OIF + .files dir  | yes (pure Python)   | io.oib         |
# | IMS (HDF5, libhdf5 defaults)   | yes (pure Python)   | io.hdf5        |
# | IMS (libhdf5-'latest' format)  | yes (ctypes system  | io.hdf5_native |
# |                                |  libhdf5 fallback)  |                |
# | ND2 (compressed chunk-map),    | gated (needs        | start_jvm gate |
# |   SLD, JPEG-XR CZI, OME exotic |  javabridge+JVM)    |                |
#
# The gate raises with guidance instead of silently failing; install
# javabridge/python-bioformats on a JVM-equipped host to lift it.

def is_javabridge_loaded() -> bool:
    """True if the Java bridge is importable
    (reference ``importer.is_javabridge_loaded``)."""
    try:
        import javabridge  # noqa: F401
        return True
    except ImportError:
        return False


def start_jvm(heap_size: str = "8G") -> None:
    """Start the Bioformats JVM (reference ``importer.start_jvm``);
    raises with guidance when the Java stack is absent."""
    if not is_javabridge_loaded():
        raise ImportError(
            "javabridge/python-bioformats are required for this format; "
            "CZI/LIF import natively via io.czi_lif (import_czi/"
            "import_lif), or import TIFF/NPY/raw, or install the Java "
            "stack")
    import javabridge
    import bioformats
    javabridge.start_vm(class_path=bioformats.JARS,
                        max_heap_size=heap_size)


def stop_jvm() -> None:
    """Stop the JVM if running (reference ``importer.stop_jvm``)."""
    if is_javabridge_loaded():
        import javabridge
        javabridge.kill_vm()


def parse_ome(filename: str):
    """Parse OME metadata (reference ``importer.parse_ome :173``);
    requires the Java stack."""
    start_jvm()  # raises with guidance if unavailable


def parse_ome_raw(filename: str):
    """Parse OME XML directly (reference ``importer.parse_ome_raw``);
    requires the Java stack."""
    start_jvm()
