"""Blob/ROI/truth database (sqlite3), reference-schema compatible.

Equivalent of ``magmap/io/sqlite.py``: the same table schema
(``about``/``experiments``/``rois``/``blobs``/``blob_matches``,
``sqlite.py:62-101``, DB version 4) so databases interchange with the
reference; ``ClrDB`` wrapper (``:625``), blob insert/select
(``:359/:438``), verification stats, and truth-DB loading/merging.

Blob rows store x,y,z in DB column order but the API speaks z,y,x blob
arrays (reference convention).
"""

from __future__ import annotations

import datetime
import os
import sqlite3
from typing import List, Optional, Sequence, Tuple

import numpy as np

from magellanmapper_tpu.utils import libmag

DB_NAME = "magmap.db"
DB_VERSION = 4


def _create_db(path: str):
    if os.path.exists(path):
        libmag.backup_file(path)
    conn = sqlite3.connect(path)
    conn.row_factory = sqlite3.Row
    cur = conn.cursor()
    cur.execute(
        "CREATE TABLE about (version INTEGER PRIMARY KEY, date DATE)")
    cur.execute(
        "CREATE TABLE experiments (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "name TEXT, date DATE)")
    cur.execute(
        "CREATE TABLE rois (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "experiment_id INTEGER, series INTEGER, "
        "offset_x INTEGER, offset_y INTEGER, offset_z INTEGER, "
        "size_x INTEGER, size_y INTEGER, size_z INTEGER, "
        "UNIQUE (experiment_id, series, offset_x, offset_y, offset_z))")
    cur.execute(
        "CREATE TABLE blobs (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "roi_id INTEGER, x INTEGER, y INTEGER, z INTEGER, radius REAL, "
        "confirmed INTEGER, truth INTEGER, channel INTEGER, "
        "UNIQUE (roi_id, x, y, z, truth, channel))")
    cur.execute(
        "CREATE TABLE blob_matches (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "roi_id INTEGER, blob1 INTEGER, blob2 INTEGER, dist REAL, "
        "FOREIGN KEY (roi_id) REFERENCES rois (id) "
        "ON UPDATE CASCADE ON DELETE CASCADE, "
        "FOREIGN KEY (blob1) REFERENCES blobs (id) "
        "ON UPDATE CASCADE ON DELETE CASCADE,"
        "FOREIGN KEY (blob2) REFERENCES blobs (id) "
        "ON UPDATE CASCADE ON DELETE CASCADE)")
    cur.execute("INSERT INTO about (version, date) VALUES (?, ?)",
                (DB_VERSION, datetime.datetime.now().isoformat()))
    conn.commit()
    return conn, cur


class ClrDB:
    """Database wrapper (reference ``sqlite.ClrDB :625``)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path or DB_NAME
        self.conn: Optional[sqlite3.Connection] = None
        self.cur: Optional[sqlite3.Cursor] = None

    def load_db(self, path: Optional[str] = None) -> "ClrDB":
        if path:
            self.path = path
        if os.path.exists(self.path):
            self.conn = sqlite3.connect(self.path)
            self.conn.row_factory = sqlite3.Row
            self.cur = self.conn.cursor()
        else:
            self.conn, self.cur = _create_db(self.path)
        return self

    def close(self):
        if self.conn is not None:
            self.conn.close()
            self.conn = None

    # -- experiments / ROIs --------------------------------------------------

    def select_or_insert_experiment(
            self, exp_name: str, date=None) -> int:
        self.cur.execute(
            "SELECT id FROM experiments WHERE name = ?", (exp_name,))
        row = self.cur.fetchone()
        if row:
            return row["id"]
        self.cur.execute(
            "INSERT INTO experiments (name, date) VALUES (?, ?)",
            (exp_name, date or datetime.datetime.now().isoformat()))
        self.conn.commit()
        return self.cur.lastrowid

    def select_or_insert_roi(
            self, exp_id: int, series: int, offset: Sequence[int],
            size: Sequence[int]) -> Tuple[int, str]:
        """offset/size given in x,y,z (DB convention)."""
        self.cur.execute(
            "SELECT id FROM rois WHERE experiment_id = ? AND series = ? "
            "AND offset_x = ? AND offset_y = ? AND offset_z = ?",
            (exp_id, series, *offset[:3]))
        row = self.cur.fetchone()
        if row:
            return row["id"], "exists"
        self.cur.execute(
            "INSERT INTO rois (experiment_id, series, offset_x, offset_y, "
            "offset_z, size_x, size_y, size_z) VALUES (?,?,?,?,?,?,?,?)",
            (exp_id, series, *offset[:3], *size[:3]))
        self.conn.commit()
        return self.cur.lastrowid, "inserted"

    def get_rois(self, exp_id: Optional[int] = None) -> List[sqlite3.Row]:
        if exp_id is None:
            self.cur.execute("SELECT * FROM rois")
        else:
            self.cur.execute(
                "SELECT * FROM rois WHERE experiment_id = ?", (exp_id,))
        return self.cur.fetchall()

    # -- blobs ----------------------------------------------------------------

    def insert_blobs(
            self, roi_id: int, blobs: np.ndarray) -> int:
        """Insert z,y,x blob rows (reference ``insert_blobs :359``)."""
        rows = []
        for b in blobs:
            confirmed = b[4] if len(b) > 4 else -1
            truth = b[5] if len(b) > 5 else -1
            channel = b[6] if len(b) > 6 else 0
            rows.append((
                roi_id, int(round(b[2])), int(round(b[1])),
                int(round(b[0])), float(b[3]), int(confirmed), int(truth),
                int(channel)))
        self.cur.executemany(
            "INSERT OR REPLACE INTO blobs (roi_id, x, y, z, radius, "
            "confirmed, truth, channel) VALUES (?,?,?,?,?,?,?,?)", rows)
        self.conn.commit()
        return len(rows)

    def select_blobs_by_roi(self, roi_id: int) -> np.ndarray:
        """Blobs of an ROI as an N x 10 z,y,x array."""
        self.cur.execute(
            "SELECT z, y, x, radius, confirmed, truth, channel "
            "FROM blobs WHERE roi_id = ?", (roi_id,))
        rows = self.cur.fetchall()
        if not rows:
            return np.zeros((0, 10))
        arr = np.array([[
            r["z"], r["y"], r["x"], r["radius"], r["confirmed"],
            r["truth"], r["channel"]] for r in rows], dtype=float)
        # N x 10 layout: abs coords initialized from rel
        return np.column_stack([arr, arr[:, :3]])

    def select_blobs_confirmed(self, confirmed: int) -> np.ndarray:
        self.cur.execute(
            "SELECT z, y, x, radius, confirmed, truth, channel FROM blobs "
            "WHERE confirmed = ?", (confirmed,))
        rows = self.cur.fetchall()
        return np.array([[r[k] for k in (
            "z", "y", "x", "radius", "confirmed", "truth", "channel")]
            for r in rows], dtype=float).reshape(-1, 7)

    def delete_blobs(self, roi_id: int) -> None:
        self.cur.execute("DELETE FROM blobs WHERE roi_id = ?", (roi_id,))
        self.conn.commit()

    # -- blob matches ----------------------------------------------------------

    def insert_blob_matches(
            self, roi_id: int, matches) -> None:
        """Insert matches (BlobMatch or list of (blob1, blob2, dist))."""
        items = matches.df.iterrows() if hasattr(matches, "df") and \
            matches.df is not None else enumerate(matches)
        for _, m in items:
            if hasattr(m, "get"):
                b1 = m.get("Blob1")
                b2 = m.get("Blob2")
                dist = m.get("Distance")
            else:
                b1, b2, dist = m
            id1 = self._blob_id_for(roi_id, b1)
            id2 = self._blob_id_for(roi_id, b2)
            self.cur.execute(
                "INSERT INTO blob_matches (roi_id, blob1, blob2, dist) "
                "VALUES (?,?,?,?)", (roi_id, id1, id2, float(dist)))
        self.conn.commit()

    def _blob_id_for(self, roi_id: int, blob) -> Optional[int]:
        self.cur.execute(
            "SELECT id FROM blobs WHERE roi_id = ? AND x = ? AND y = ? "
            "AND z = ?",
            (roi_id, int(round(blob[2])), int(round(blob[1])),
             int(round(blob[0]))))
        row = self.cur.fetchone()
        return row["id"] if row else None

    def select_blob_matches(self, roi_id: int) -> List[Tuple]:
        self.cur.execute(
            "SELECT blob1, blob2, dist FROM blob_matches WHERE roi_id = ?",
            (roi_id,))
        return [tuple(r) for r in self.cur.fetchall()]

    # -- verification ----------------------------------------------------------

    def verification_stats(self) -> Tuple[int, int, int]:
        """(pos, true_pos, false_pos) over confirmed flags
        (reference ``verification_stats :454``)."""
        self.cur.execute(
            "SELECT COUNT(*) AS n FROM blobs WHERE truth >= 0")
        pos = self.cur.fetchone()["n"]
        self.cur.execute(
            "SELECT COUNT(*) AS n FROM blobs WHERE confirmed = 1 AND "
            "truth = -1")
        true_pos = self.cur.fetchone()["n"]
        self.cur.execute(
            "SELECT COUNT(*) AS n FROM blobs WHERE confirmed = 0")
        false_pos = self.cur.fetchone()["n"]
        return pos, true_pos, false_pos


def load_db(path: str) -> ClrDB:
    """Load or create a database at ``path``."""
    return ClrDB(path).load_db()


def load_truth_db(path: str) -> ClrDB:
    """Load a truth database (reference ``load_truth_db :599``)."""
    if not path.endswith(".db"):
        path = f"{path}.db"
    return load_db(path)


def merge_truth_dbs(paths: Sequence[str], out_path: str) -> ClrDB:
    """Merge truth databases into one (reference ``merge_truth_dbs``)."""
    out = load_db(out_path)
    for path in paths:
        src = load_db(path)
        src.cur.execute(
            "SELECT e.name, r.series, r.offset_x, r.offset_y, r.offset_z, "
            "r.size_x, r.size_y, r.size_z, r.id AS roi_id "
            "FROM rois r JOIN experiments e ON r.experiment_id = e.id")
        for roi in src.cur.fetchall():
            exp_id = out.select_or_insert_experiment(roi["name"])
            roi_id, _ = out.select_or_insert_roi(
                exp_id, roi["series"],
                (roi["offset_x"], roi["offset_y"], roi["offset_z"]),
                (roi["size_x"], roi["size_y"], roi["size_z"]))
            blobs = src.select_blobs_by_roi(roi["roi_id"])
            if len(blobs):
                out.insert_blobs(roi_id, blobs)
        src.close()
    return out


def get_exp_name(path: str) -> str:
    """Experiment name for the DB: basename without extension, sub-image
    suffix preserved (reference ``sqlite.get_exp_name :178``)."""
    from magellanmapper_tpu.io import importer
    base = importer.deconstruct_img_name(path)[0]
    return os.path.splitext(os.path.basename(base))[0] if base else base


def match_elements(src: str, delim: str, repeat: str) -> str:
    """Repeat a token once per delimited element of ``src``
    (reference ``sqlite.match_elements :493``)."""
    return delim.join([repeat] * len(src.split(delim)))


def _clrdb_select_about(self) -> list:
    self.cur.execute("SELECT * FROM about")
    return self.cur.fetchall()


def _clrdb_db_version(self) -> int:
    try:
        rows = self.select_about()
        return int(rows[-1]["version"]) if rows else 0
    except sqlite3.OperationalError:
        return 0


def _clrdb_upgrade_db(self) -> int:
    """Bring an older database to the current schema
    (reference ``sqlite.upgrade_db :101``): adds the ``about`` table
    (v2), blob channel column (v3), and ``blob_matches`` table (v4)."""
    ver = self.db_version()
    if ver >= DB_VERSION:
        return ver
    if ver < 2:
        try:
            self.cur.execute(
                "CREATE TABLE about "
                "(version INTEGER PRIMARY KEY, date DATE)")
        except sqlite3.OperationalError:
            pass
    if ver < 3:
        cols = [r["name"] for r in self.cur.execute(
            "PRAGMA table_info(blobs)")]
        if "channel" not in cols:
            self.cur.execute(
                "ALTER TABLE blobs ADD COLUMN channel INTEGER DEFAULT 0")
    if ver < 4:
        self.cur.execute(
            "CREATE TABLE IF NOT EXISTS blob_matches "
            "(id INTEGER PRIMARY KEY AUTOINCREMENT, roi_id INTEGER, "
            "blob1 INTEGER, blob2 INTEGER, dist REAL)")
    self.cur.execute("INSERT INTO about (version, date) VALUES (?, ?)",
                     (DB_VERSION, datetime.datetime.now().isoformat()))
    self.conn.commit()
    return DB_VERSION


def _clrdb_select_rois(self, exp_id=None):
    return self.get_rois(exp_id)


def _clrdb_select_roi(self, roi_id: int):
    """One ROI row by ID (reference ``sqlite.select_roi :344``)."""
    self.cur.execute("SELECT * FROM rois WHERE id = ?", (roi_id,))
    return self.cur.fetchone()


def _clrdb_update_rois(self, offset, size) -> int:
    """Shift all ROI offsets by ``-offset`` and grow sizes by ``size``
    (reference ``sqlite.update_rois :321``)."""
    self.cur.execute("SELECT * FROM rois")
    rows = self.cur.fetchall()
    for row in rows:
        self.cur.execute(
            "UPDATE rois SET offset_x = ?, offset_y = ?, offset_z = ?, "
            "size_x = ?, size_y = ?, size_z = ? WHERE id = ?",
            (row["offset_x"] - offset[0], row["offset_y"] - offset[1],
             row["offset_z"] - offset[2], row["size_x"] + size[0],
             row["size_y"] + size[1], row["size_z"] + size[2], row["id"]))
    self.conn.commit()
    return len(rows)


def _clrdb_get_roi_offset(self, roi) -> tuple:
    """ROI offset as x,y,z (reference ``sqlite.get_roi_offset``)."""
    return (roi["offset_x"], roi["offset_y"], roi["offset_z"])


def _clrdb_get_roi_size(self, roi) -> tuple:
    """ROI shape as x,y,z (reference ``sqlite.get_roi_size``)."""
    return (roi["size_x"], roi["size_y"], roi["size_z"])


ClrDB.select_about = _clrdb_select_about
ClrDB.db_version = _clrdb_db_version
ClrDB.upgrade_db = _clrdb_upgrade_db
ClrDB.select_rois = _clrdb_select_rois
ClrDB.select_roi = _clrdb_select_roi
ClrDB.update_rois = _clrdb_update_rois
ClrDB.get_roi_offset = _clrdb_get_roi_offset
ClrDB.get_roi_size = _clrdb_get_roi_size


# -- module-level (conn, cur) wrappers, reference sqlite.py API style ------

def _db_for(conn, cur) -> ClrDB:
    db = ClrDB()
    db.conn = conn
    db.cur = cur
    return db


def insert_about(conn, cur, version: int, date) -> None:
    """Insert an about row (reference ``sqlite.insert_about``)."""
    cur.execute("INSERT INTO about (version, date) VALUES (?, ?)",
                (version, date))
    conn.commit()


def select_about(conn, cur) -> list:
    """All about rows (reference ``sqlite.select_about``)."""
    cur.execute("SELECT * FROM about")
    return cur.fetchall()


def upgrade_db(conn, cur) -> int:
    """Upgrade an old database in place
    (reference ``sqlite.upgrade_db :101``)."""
    return _db_for(conn, cur).upgrade_db()


def insert_experiment(conn, cur, name: str, date=None) -> int:
    """Insert an experiment row (reference ``sqlite.insert_experiment
    :196``)."""
    cur.execute("INSERT INTO experiments (name, date) VALUES (?, ?)",
                (name, date or datetime.datetime.now().isoformat()))
    conn.commit()
    return cur.lastrowid


def insert_roi(conn, cur, exp_id: int, series: int, offset, size):
    """Insert or fetch an ROI row (reference ``sqlite.insert_roi``)."""
    return _db_for(conn, cur).select_or_insert_roi(
        exp_id, series, offset, size)


def select_or_insert_roi(conn, cur, exp_id: int, series: int, offset, size):
    """Fetch-or-create an ROI row (reference
    ``sqlite.select_or_insert_roi :270``)."""
    return _db_for(conn, cur).select_or_insert_roi(
        exp_id, series, offset, size)


def insert_blobs(conn, cur, roi_id: int, blobs) -> int:
    """Insert blob rows for an ROI (reference ``sqlite.insert_blobs
    :359``)."""
    return _db_for(conn, cur).insert_blobs(roi_id, np.asarray(blobs))


def delete_blobs(conn, cur, roi_id: int, blobs) -> int:
    """Delete blobs matching the given ROI ID and z,y,x coordinates
    (reference ``sqlite.delete_blobs :387``); returns rows deleted."""
    deleted = 0
    for blob in blobs:
        cur.execute(
            "DELETE FROM blobs WHERE roi_id = ? AND z = ? AND y = ? "
            "AND x = ?",
            (roi_id, int(round(blob[0])), int(round(blob[1])),
             int(round(blob[2]))))
        deleted += cur.rowcount
    conn.commit()
    return deleted


def select_blobs_confirmed(cur, confirmed: int) -> np.ndarray:
    """All blobs with the given confirmation flag across every ROI
    (reference ``sqlite.select_blobs_confirmed :438``)."""
    cur.execute(
        "SELECT z, y, x, radius, confirmed, truth, channel FROM blobs "
        "WHERE confirmed = ?", (confirmed,))
    rows = cur.fetchall()
    return np.array([[r[k] for k in (
        "z", "y", "x", "radius", "confirmed", "truth", "channel")]
        for r in rows], dtype=float).reshape(-1, 7)


def verification_stats(db: "ClrDB", exp_name: str, treat_maybes: int = 0):
    """Sens/PPV from verified blobs of an experiment (reference
    ``sqlite.verification_stats :454`` ->
    ``detector.meas_detection_accuracy``)."""
    from magellanmapper_tpu.cv import verifier
    exp_id = db.select_or_insert_experiment(exp_name)
    parts = [db.select_blobs_by_roi(roi["id"])
             for roi in db.get_rois(exp_id)]
    parts = [p for p in parts if len(p)]
    if not parts:
        return None, None, None
    return verifier.meas_detection_accuracy(
        np.vstack(parts), verified=True, treat_maybes=treat_maybes)


def select_rois(cur, exp_id: Optional[int] = None) -> list:
    """ROI rows (reference ``sqlite.select_rois``)."""
    if exp_id is None:
        cur.execute("SELECT * FROM rois")
    else:
        cur.execute(
            "SELECT * FROM rois WHERE experiment_id = ?", (exp_id,))
    return cur.fetchall()


def select_roi(cur, roi_id: int):
    """One ROI row (reference ``sqlite.select_roi :344``)."""
    cur.execute("SELECT * FROM rois WHERE id = ?", (roi_id,))
    return cur.fetchone()


def update_rois(conn, cur, offset, size) -> int:
    """Shift all ROIs (reference ``sqlite.update_rois :321``)."""
    return _db_for(conn, cur).update_rois(offset, size)


def get_roi_offset(roi) -> Tuple[int, int, int]:
    """x,y,z offset of an ROI row (reference ``sqlite.get_roi_offset``)."""
    return (roi["offset_x"], roi["offset_y"], roi["offset_z"])


def get_roi_size(roi) -> Tuple[int, int, int]:
    """x,y,z size of an ROI row (reference ``sqlite.get_roi_size``)."""
    return (roi["size_x"], roi["size_y"], roi["size_z"])


def clean_up_blobs(db: ClrDB) -> int:
    """Remove blobs whose ROI no longer exists
    (reference ``sqlite.clean_up_blobs`` maintenance flow)."""
    db.cur.execute(
        "DELETE FROM blobs WHERE roi_id NOT IN (SELECT id FROM rois)")
    db.conn.commit()
    return db.cur.rowcount
