"""General utilities (paths, sequences, dtypes, normalization).

Capability parity with the reference's grab-bag ``magmap/io/libmag.py``:
path manipulation (``insert_before_ext``, ``splitext``, ``combine_paths``),
value normalization (``normalize:449``), integer-range dtype selection
(``dtype_within_range``), file backup before overwrite (``backup_file:969``),
and misc sequence helpers.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Sequence, Tuple, Union

import numpy as np

#: multi-part extensions treated as a single suffix.
EXTS_COMPOUND = (".nii.gz", ".ome.tif", ".ome.tiff", ".tar.gz")


def splitext(path: str) -> Tuple[str, str]:
    """Split extension, keeping compound extensions intact."""
    lower = path.lower()
    for ext in EXTS_COMPOUND:
        if lower.endswith(ext):
            return path[: len(path) - len(ext)], path[len(path) - len(ext):]
    return os.path.splitext(path)


def insert_before_ext(path: str, insert: str, sep: str = "") -> str:
    """Insert ``insert`` before the file extension of ``path``."""
    base, ext = splitext(path)
    return f"{base}{sep}{insert}{ext}"


def combine_paths(
        base: Optional[str], suffix: str, sep: str = "_",
        ext: Optional[str] = None, check_dir: bool = False) -> str:
    """Combine a base path with a suffix, optionally replacing extension."""
    if not base:
        return suffix
    root, base_ext = splitext(base)
    if suffix.startswith("."):
        out = root + suffix
    else:
        out = f"{root}{sep}{suffix}"
    if ext:
        out = splitext(out)[0] + (ext if ext.startswith(".") else "." + ext)
    if check_dir:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    return out


def get_filename_without_ext(path: str) -> str:
    return splitext(os.path.basename(path))[0]


def backup_file(path: str, modifier: str = "") -> Optional[str]:
    """Move an existing file aside as ``path(.N)`` before overwrite.

    Returns the backup path or None if ``path`` does not exist (capability
    of reference ``libmag.backup_file:969``).
    """
    if not os.path.exists(path):
        return None
    i = 1
    while True:
        backup = insert_before_ext(path, f"{modifier}({i})")
        if not os.path.exists(backup):
            shutil.move(path, backup)
            return backup
        i += 1


def normalize(
        arr: np.ndarray, minimum: float, maximum: float,
        background: Optional[float] = None) -> np.ndarray:
    """Linearly rescale ``arr`` to ``[minimum, maximum]``.

    Values equal to ``background`` are excluded from the input range and
    mapped to ``minimum`` (reference ``libmag.normalize:449`` semantics).
    """
    arr = np.asarray(arr, dtype=float)
    if arr.size < 1:
        return arr
    if background is not None:
        fg = arr[arr != background]
        lo = fg.min() if fg.size else 0.0
        hi = fg.max() if fg.size else 1.0
    else:
        lo, hi = float(arr.min()), float(arr.max())
    denom = hi - lo
    if denom == 0:
        out = np.full_like(arr, minimum)
    else:
        out = (arr - lo) / denom * (maximum - minimum) + minimum
    if background is not None:
        out[arr == background] = minimum
    return out


_INT_TYPES = (np.uint8, np.int8, np.uint16, np.int16,
              np.uint32, np.int32, np.uint64, np.int64)


def dtype_within_range(
        min_val: float, max_val: float,
        integer: bool = True, signed: Optional[bool] = None) -> np.dtype:
    """Smallest dtype able to hold ``[min_val, max_val]``."""
    if not integer:
        for t in (np.float32, np.float64):
            info = np.finfo(t)
            if min_val >= info.min and max_val <= info.max:
                return np.dtype(t)
        raise ValueError("range too large for float64")
    for t in _INT_TYPES:
        if signed is True and np.issubdtype(t, np.unsignedinteger):
            continue
        if signed is False and np.issubdtype(t, np.signedinteger):
            continue
        info = np.iinfo(t)
        if min_val >= info.min and max_val <= info.max:
            return np.dtype(t)
    raise ValueError(f"range [{min_val}, {max_val}] too large for int64")


def to_seq(val: Any, n: Optional[int] = None) -> Optional[Sequence]:
    """Coerce scalars to sequences, broadcasting to length ``n``."""
    if val is None:
        return None
    if np.isscalar(val):
        return (val,) * (n or 1)
    seq = tuple(val)
    if n is not None and len(seq) == 1:
        seq = seq * n
    return seq


def pad_seq(seq: Sequence, length: int, pad: Any = None) -> list:
    """Pad or truncate a sequence to ``length``."""
    out = list(seq)[:length]
    out.extend([pad] * (length - len(out)))
    return out


def is_binary(img: np.ndarray) -> bool:
    """True if the image has at most two distinct values."""
    return np.unique(img).size <= 2


def format_bytes(num: float) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(num) < 1024:
            return f"{num:.1f}{unit}"
        num /= 1024
    return f"{num:.1f}PB"


def npstr_to_array(s: str) -> Optional[np.ndarray]:
    """Parse a stringified numpy array back into an array
    (reference ``libmag.npstr_to_array:882``)."""
    nums = re.findall(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?", s)
    if not nums:
        return None
    return np.array([float(n) for n in nums])


def make_abs_path(path: str, base_dir: Optional[str] = None) -> str:
    if os.path.isabs(path) or base_dir is None:
        return path
    return os.path.join(base_dir, path)


def is_seq(val: Any) -> bool:
    """True for list/tuple/ndarray (not strings)."""
    return isinstance(val, (list, tuple, np.ndarray))


def swap_elements(arr, axis0: int, axis1: int, offset: int = 0):
    """Swap two elements of a list/tuple/array; tuples come back as new
    tuples (reference ``libmag.swap_elements :46``)."""
    was_tuple = isinstance(arr, tuple)
    out = list(arr) if not isinstance(arr, np.ndarray) else arr.copy()
    i, j = axis0 + offset, axis1 + offset
    out[i], out[j] = out[j], out[i]
    return tuple(out) if was_tuple else out


def transpose_1d(arr, plane: str):
    """Reorder a z,y,x 1D sequence for an ``xz``/``yz`` plane view
    (reference ``libmag.transpose_1d :71``)."""
    if plane == "xz":
        return swap_elements(arr, 0, 1)
    if plane == "yz":
        return swap_elements(swap_elements(arr, 0, 2), 1, 2)
    return arr


def transpose_1d_rev(arr, plane: str):
    """Inverse of :func:`transpose_1d` (reference ``:83``)."""
    if plane == "xz":
        return swap_elements(arr, 1, 0)
    if plane == "yz":
        return swap_elements(swap_elements(arr, 2, 1), 2, 0)
    return arr


def roll_elements(arr, shift: int, axis: Optional[int] = None):
    """``np.roll`` that keeps tuples as tuples (reference ``:95``)."""
    was_tuple = isinstance(arr, tuple)
    out = np.roll(np.asarray(arr) if was_tuple else arr, shift, axis)
    return tuple(out) if was_tuple else out


def replace_seq(seq: Sequence, replacement: Sequence) -> np.ndarray:
    """Overlay ``replacement`` onto a copy of ``seq`` (as arrays),
    replacing as many leading values as fit (reference ``:165``)."""
    out = np.asarray(seq).copy()
    rep = np.asarray(replacement)
    n = min(len(out), len(rep))
    out[:n] = rep[:n]
    return out


def combine_arrs(arrs, filter_none: bool = True, fn=None, **kwargs):
    """Concatenate (or ``fn``) arrays after dropping ``None``s
    (reference ``:196``)."""
    if arrs is None:
        return None
    kept = [a for a in arrs if a is not None] if filter_none else list(arrs)
    kept = [a for a in kept if not (hasattr(a, "__len__") and len(a) == 0)]
    if not kept:
        return None
    return (fn or np.concatenate)(kept, **kwargs)


def flatten(vals):
    """Flatten arbitrarily nested sequences (generator, reference
    ``:230``)."""
    for val in vals:
        if is_seq(val):
            yield from flatten(val)
        else:
            yield val


def match_ext(path: str, path_to_match: str) -> str:
    """Give ``path_to_match`` the extension of ``path``
    (reference ``match_ext :296``)."""
    ext = splitext(path)[1]
    if not ext:
        return path_to_match
    return splitext(path_to_match)[0] + ext


def make_out_path(
        base_path: Optional[str] = None, prefix: Optional[str] = None,
        suffix: Optional[str] = None, combine_prefix: bool = False) -> str:
    """Output path from base/prefix/suffix: a prefix replaces the base
    unless ``combine_prefix`` (reference ``make_out_path :372``)."""
    path = base_path or ""
    if prefix and not combine_prefix:
        path = prefix
    elif prefix:
        path = os.path.join(os.path.dirname(path),
                            prefix + os.path.basename(path))
    if suffix:
        path = insert_before_ext(path, suffix)
    return path


def remove_file(path: str) -> bool:
    """Remove a file if present; True when removed (reference ``:404``)."""
    try:
        if os.path.isfile(path):
            os.remove(path)
            return True
    except OSError:
        pass
    return False


def last_lines(path: str, n: int) -> Optional[list]:
    """Last ``n`` lines of a text file (reference ``libmag.last_lines``)."""
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return f.readlines()[-n:]


def get_int(val):
    """Parse to int, then float, else return unchanged (reference
    ``libmag.get_int``)."""
    try:
        return int(val)
    except (TypeError, ValueError):
        try:
            return float(val)
        except (TypeError, ValueError):
            return val


def is_int(val) -> bool:
    """True if value is integral (reference ``libmag.is_int``)."""
    try:
        return float(val).is_integer()
    except (TypeError, ValueError):
        return False


def is_number(val) -> bool:
    """True if value parses as a number (reference ``libmag.is_number``)."""
    try:
        float(val)
        return True
    except (TypeError, ValueError):
        return False
