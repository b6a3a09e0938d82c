"""Compression helpers (reference ``magmap/io/subproc_io.py``).

zstd/zip compress/decompress via subprocess when the binaries exist,
with a Python zipfile/gzip fallback.
"""

from __future__ import annotations

import gzip
import logging
import os
import shutil
import subprocess
import zipfile
from typing import Optional

_logger = logging.getLogger(__name__)


def _has_cmd(name: str) -> bool:
    return shutil.which(name) is not None


def compress_file(
        path: str, out_path: Optional[str] = None,
        fmt: str = "zstd") -> str:
    """Compress a file or directory; returns the archive path."""
    if fmt == "zstd" and _has_cmd("zstd") and os.path.isfile(path):
        out_path = out_path or path + ".zst"
        subprocess.run(["zstd", "-f", path, "-o", out_path], check=True)
        return out_path
    if fmt in ("zip", "zstd"):
        out_path = out_path or path + ".zip"
        with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
            if os.path.isdir(path):
                for root, _, files in os.walk(path):
                    for f in files:
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, path))
            else:
                zf.write(path, os.path.basename(path))
        return out_path
    if fmt == "gz":
        out_path = out_path or path + ".gz"
        with open(path, "rb") as fin, gzip.open(out_path, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        return out_path
    raise ValueError(f"unknown compression format: {fmt}")


def decompress_file(path: str, out_dir: Optional[str] = None) -> str:
    """Decompress an archive; returns the output path."""
    out_dir = out_dir or os.path.dirname(path) or "."
    os.makedirs(out_dir, exist_ok=True)
    if path.endswith(".zst") and _has_cmd("zstd"):
        out = os.path.join(
            out_dir, os.path.basename(path)[:-4])
        subprocess.run(["zstd", "-d", "-f", path, "-o", out], check=True)
        return out
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(out_dir)
        return out_dir
    if path.endswith(".gz"):
        out = os.path.join(out_dir, os.path.basename(path)[:-3])
        with gzip.open(path, "rb") as fin, open(out, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        return out
    raise ValueError(f"unknown archive type: {path}")


def test_compression(path: str) -> bool:
    """Integrity-check a zstd-compressed file
    (reference ``subproc_io.test_compression :58``)."""
    for cmd in (["pzstd", "-t", path], ["zstd", "-t", path]):
        if _has_cmd(cmd[0]):
            try:
                subprocess.check_call(
                    cmd, stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL)
                return True
            except subprocess.CalledProcessError:
                return False
    # no zstd binary: fall back to tarfile/numpy readability checks
    import tarfile
    try:
        if tarfile.is_tarfile(path):
            with tarfile.open(path) as tf:
                tf.getmembers()
        else:
            with open(path, "rb") as f:
                f.read(1 << 16)
        return True
    except Exception:
        return False
