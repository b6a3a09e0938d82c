#!/usr/bin/env python
"""Format-matrix demo: build one file of EVERY supported proprietary
container from its on-disk spec, import each through the CLI path, and
verify the voxels round-trip into memmapped image5d archives.

Formats: OME-TIFF, Zeiss CZI (zstd-compressed AND per-plane JPEG),
Leica LIF (with Length calibration), Nikon ND2 (chunk map AND the
legacy JP2 container), Olympus OIB (OLE2 compound file) and OIF (INI +
plane directory), Imaris IMS (HDF5 chunked+gzip, default AND
libhdf5-'latest' profiles). Readers are pure Python except where the
format genuinely needs a codec: JPEG/JPEG 2000/latest-HDF5 bind the
system libjpeg/libopenjp2/libhdf5 via ctypes — still no
Bioformats/JVM, no tifffile/h5py.

Run: python examples/demo_formats.py [out_dir]   (CPU only; no TPU)
"""

import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(out_dir="demo_out/formats"):
    os.makedirs(out_dir, exist_ok=True)
    out = pathlib.Path(out_dir)
    # reuse the byte-level spec-stream builders the tests pin against
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_hdf5_ims import build_ims
    from test_nd2 import _attributes as nd2_attrs, _build_nd2
    from test_oib import _tiff_bytes, build_cfbf

    from magellanmapper_tpu.io import cli, czi_lif, np_io, tiff

    rng = np.random.default_rng(0)
    vol = (rng.random((4, 24, 24)) * 4000).astype(np.uint16)
    files = {}

    # OME-TIFF: hand-written OME-XML block in ImageDescription
    ome = (
        '<?xml version="1.0"?><OME xmlns="http://www.openmicroscopy.'
        'org/Schemas/OME/2016-06"><Image><Pixels DimensionOrder='
        '"XYZCT" Type="uint16" SizeX="24" SizeY="24" SizeZ="4" '
        'SizeC="1" SizeT="1" PhysicalSizeX="0.5" PhysicalSizeY="0.5" '
        'PhysicalSizeZ="2.0"><TiffData/></Pixels></Image></OME>')
    path = str(out / "demo.ome.tif")
    tiff.write_tiff(path, vol, description=ome)
    files["OME-TIFF"] = path

    path = str(out / "demo.czi")
    czi_lif.write_czi(path, vol, resolutions=(2.0, 0.5, 0.5),
                      compression="zstd0")
    files["CZI-zstd"] = path

    path = str(out / "demo.lif")
    czi_lif.write_lif(path, vol, resolutions=(2.0, 0.5, 0.5))
    files["LIF"] = path

    path = str(out / "demo.nd2")
    with open(path, "wb") as f:
        f.write(_build_nd2(list(vol), nd2_attrs(24, 24, n_seq=4)))
    files["ND2"] = path

    # OIB: OLE2 compound file of per-plane TIFF streams
    streams = {
        f"s_C001Z{z + 1:03d}.tif": _tiff_bytes(vol[z], out, f"oib{z}")
        for z in range(vol.shape[0])}
    path = str(out / "demo.oib")
    with open(path, "wb") as f:
        f.write(build_cfbf(streams))
    files["OIB"] = path

    # OIF: UTF-16 INI main file + .files plane directory
    oif_main = str(out / "demo.oif")
    fdir = pathlib.Path(oif_main + ".files")
    fdir.mkdir(exist_ok=True)
    for z in range(vol.shape[0]):
        tiff.write_tiff(
            str(fdir / f"s_C001Z{z + 1:03d}.tif"), vol[z][None])
    ini = ("[Reference Image Parameter]\nWidthConvertValue=0.5\n"
           '[Axis 3 Parameters Common]\nAxisCode="Z"\nInterval=2.0\n')
    with open(oif_main, "wb") as f:
        f.write(b"\xff\xfe" + ini.encode("utf-16-le"))
    files["OIF"] = oif_main

    files["IMS"] = build_ims(out, [vol])

    # exact expectations by default; codec-backed formats carry their
    # own expected volume (and JPEG its lossy tolerance)
    files = {name: (path, vol, 0) for name, path in files.items()}

    from magellanmapper_tpu import native
    if native.jpeg_available():
        plane = np.full((1, 24, 24), 30, np.uint8)
        plane[0, 6:18, 6:18] = 200
        path = str(out / "demo_jpeg.czi")
        czi_lif.write_czi(path, plane, resolutions=(2.0, 0.5, 0.5),
                          compression="jpeg")
        files["CZI-jpeg"] = (path, plane, 2)

    from magellanmapper_tpu.io import hdf5_native
    if hdf5_native.available():
        path = str(out / "demo_latest.ims")
        with hdf5_native.NativeHdf5Writer(path, libver="latest") as w:
            ch = "DataSet/ResolutionLevel 0/TimePoint 0/Channel 0"
            w.write_dataset(ch + "/Data", vol,
                            chunks=(2, 24, 24), gzip=4, shuffle=True)
            w.create_group("DataSetInfo/Image")
            for ax, size in zip("ZYX", vol.shape):
                w.write_attr(ch, f"ImageSize{ax}", str(size))
                w.write_attr("DataSetInfo/Image", ax, str(size))
        files["IMS-lat"] = (path, vol, 0)

    from magellanmapper_tpu.io import jp2k
    if jp2k.available():
        import struct

        def box(t, p):
            return struct.pack(">I", 8 + len(p)) + t + p

        from magellanmapper_tpu.io import nd2 as nd2_mod
        ihdr = box(b"ihdr", struct.pack(
            ">IIHBBBB", 24, 24, 1, 15, 7, 0, 0))
        colr = box(b"colr", struct.pack(">BbBI", 1, 0, 0, 17))
        payload = (nd2_mod.JP2_SIGNATURE
                   + box(b"ftyp", b"jp2 " + struct.pack(">I", 0)
                         + b"jp2 ")
                   + box(b"jp2h", ihdr + colr))
        for z in range(vol.shape[0]):
            payload += box(b"jp2c",
                           jp2k.encode(vol[z], num_resolutions=4))
        path = str(out / "demo_legacy.nd2")
        with open(path, "wb") as f:
            f.write(payload)
        files["ND2-leg"] = (path, vol, 0)

    print(f"{'format':9s} {'file':16s} {'image5d':18s} match")
    ok = True
    for name, (path, want, atol) in files.items():
        prefix = str(out / ("imp_" + name.lower().replace("-", "")))
        cli.main(["--img", path, "--proc", "import_only",
                  "--prefix", prefix])
        img5d = np_io.read_file(prefix)
        got = np.asarray(img5d.img[0])
        if got.ndim == 4:
            got = got[..., 0]
        match = got.shape == want.shape and bool(
            (np.abs(got.astype(np.int64)
                    - want.astype(np.int64)) <= atol).all())
        ok &= match
        print(f"{name:9s} {os.path.basename(path):16s} "
              f"{str(img5d.img.shape):18s} {match}")
    print("ALL FORMATS ROUND-TRIP" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
