"""Corrupt-input robustness of the pure-Python format readers.

Production imports see truncated transfers and corrupt files; every
reader must raise a Python exception promptly — never hang, loop, or
return silently-wrong data — at any truncation point. (Spec-correct
parsing is pinned by each format's own spec-stream tests; this file
pins the failure behavior.)
"""

import numpy as np
import pytest

from magellanmapper_tpu.io import czi_lif, hdf5, nd2, oib, tiff

from test_hdf5_ims import H5Builder, _s1, build_ims
from test_nd2 import _attributes, _build_nd2
from test_oib import _tiff_bytes, build_cfbf


def _full_fixtures(tmp_path):
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 60000, (3, 16, 16), dtype=np.uint16)
    fixtures = {}

    fixtures["nd2"] = (_build_nd2(
        list(planes), _attributes(16, 16, n_seq=3)),
        lambda p: nd2.read_nd2(p))

    streams = {f"s_C001Z{z + 1:03d}.tif": _tiff_bytes(
        planes[z], tmp_path, f"rb{z}") for z in range(3)}
    fixtures["oib"] = (build_cfbf(streams),
                       lambda p: oib.read_oib(p))

    ims_path = build_ims(tmp_path, [planes])
    fixtures["ims"] = (open(ims_path, "rb").read(),
                       lambda p: hdf5.read_ims(p))

    tif_path = str(tmp_path / "full.tif")
    tiff.write_tiff(tif_path, planes, compression="deflate")
    fixtures["tiff"] = (open(tif_path, "rb").read(),
                        lambda p: tiff.read_tiff(p))

    czi_path = str(tmp_path / "full.czi")
    czi_lif.write_czi(czi_path, planes)
    fixtures["czi"] = (open(czi_path, "rb").read(),
                       lambda p: czi_lif.read_czi(p))

    lif_path = str(tmp_path / "full.lif")
    czi_lif.write_lif(lif_path, planes)
    fixtures["lif"] = (open(lif_path, "rb").read(),
                       lambda p: czi_lif.read_lif(p))
    return fixtures


@pytest.mark.parametrize("fmt", ["nd2", "oib", "ims", "tiff", "czi",
                                 "lif"])
@pytest.mark.parametrize("cut_frac", [0.05, 0.3, 0.7, 0.97])
def test_truncated_file_raises_cleanly(tmp_path, fmt, cut_frac):
    full, read = _full_fixtures(tmp_path)[fmt]
    cut = max(1, int(len(full) * cut_frac))
    path = tmp_path / f"cut_{fmt}_{cut_frac}.bin"
    path.write_bytes(full[:cut])
    # must raise SOME exception promptly (formats differ in which);
    # silently-empty results are as bad as hangs
    with pytest.raises(Exception):
        out = read(str(path))
        arr = out[0] if isinstance(out, tuple) else out
        if arr is None or np.asarray(arr).size == 0:
            raise ValueError("empty result from truncated file")


@pytest.mark.parametrize("fmt", ["nd2", "oib", "ims", "tiff", "czi",
                                 "lif"])
def test_bitflip_header_never_hangs(tmp_path, fmt):
    """Flip bytes through the header region: every variant either
    parses (flip hit padding) or raises — bounded, no infinite loops
    (cycle guards in the chain walkers)."""
    full, read = _full_fixtures(tmp_path)[fmt]
    rng = np.random.default_rng(1)
    for trial in range(8):
        data = bytearray(full)
        pos = int(rng.integers(0, min(len(data), 256)))
        data[pos] ^= 0xFF
        path = tmp_path / f"flip_{fmt}_{trial}.bin"
        path.write_bytes(bytes(data))
        try:
            read(str(path))
        except Exception:
            pass
