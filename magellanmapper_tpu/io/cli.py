"""Command-line interface: the reference's flag vocabulary + task dispatch.

Equivalent of ``magmap/io/cli.py`` (``process_cli_args :253``, ``main
:978``, ``process_tasks :874``, ``process_file :1172``): the same flag
names (``--img --proc --register --channel --offset/--size --subimg_*
--roi_profile --atlas_profile --grid_search --reg_suffixes --transform
--verbose ...``) drive the TPU pipeline. Instead of the reference's
mutable ``config`` module globals, parsed state lives in a ``RunConfig``
passed explicitly to tasks.

Run: ``python -m magellanmapper_tpu.io.cli --img vol.npy --proc detect``.
"""

from __future__ import annotations

import argparse
import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from magellanmapper_tpu.settings.config import ProcessTypes, RegisterTypes
from magellanmapper_tpu.settings.roi_prof import ROIProfile
from magellanmapper_tpu.settings.atlas_prof import AtlasProfile

_logger = logging.getLogger(__name__)


@dataclass
class RunConfig:
    """Parsed CLI state (replaces reference ``config`` module globals)."""
    filenames: List[str] = field(default_factory=list)
    channel: Optional[List[int]] = None
    series: int = 0
    offset: Optional[List[int]] = None
    size: Optional[List[int]] = None
    subimg_offsets: Optional[List[List[int]]] = None
    subimg_sizes: Optional[List[List[int]]] = None
    proc: Optional[ProcessTypes] = None
    proc_args: Dict[str, str] = field(default_factory=dict)
    register_type: Optional[RegisterTypes] = None
    resolutions: Optional[List[float]] = None
    roi_profile: ROIProfile = field(default_factory=ROIProfile)
    roi_profiles: List[ROIProfile] = field(default_factory=list)
    atlas_profile: AtlasProfile = field(default_factory=AtlasProfile)
    reg_suffixes: Dict[str, str] = field(default_factory=dict)
    transform: Dict[str, object] = field(default_factory=dict)
    db_path: Optional[str] = None
    truth_db: Optional[str] = None
    prefix: Optional[str] = None
    prefix_out: Optional[str] = None
    suffix: Optional[str] = None
    grid_search: Optional[str] = None
    plane: Optional[str] = None
    save_subimg: bool = False
    verbose: bool = False
    labels: Dict[str, object] = field(default_factory=dict)
    groups: Optional[List[str]] = None
    df_task: Optional[List[str]] = None
    plot_2d_task_args: Optional[List[str]] = None
    classifier: Optional[List[str]] = None
    savefig: Optional[str] = None
    plot_2d_task: Optional[str] = None
    #: device mesh (dp, sp[, spy]) for sharded whole-volume detection —
    #: a TPU-native addition with no reference analog (the reference's
    #: scale-out is "rent a bigger box", stack_detect.py:406 TODO)
    mesh: Optional[List[int]] = None
    #: cloud tasks (reference cli.py:330-335, process_tasks :893)
    ec2_start: Optional[List[object]] = None
    ec2_list: Optional[List[object]] = None
    ec2_terminate: Optional[List[str]] = None
    notify_url: Optional[str] = None
    notify_msg: Optional[str] = None
    notify_attach: Optional[str] = None
    #: remaining reference config state (cli.py:300-420): metadata
    #: paths, --load data keys, display/compat settings
    meta_paths: Optional[List[str]] = None
    load_data: Dict[str, str] = field(default_factory=dict)
    plot_labels: Dict[str, object] = field(default_factory=dict)
    slice_vals: Optional[List[int]] = None
    delay: Optional[int] = None
    cpus: Optional[int] = None
    show: bool = False
    theme: Optional[List[str]] = None
    alphas: Optional[List[float]] = None
    vmin: Optional[List[float]] = None
    vmax: Optional[List[float]] = None
    rgb: bool = False

    def get_roi_profile(self, channel: int) -> ROIProfile:
        if self.roi_profiles and channel < len(self.roi_profiles):
            return self.roi_profiles[channel]
        return self.roi_profile


def args_to_dict(args: Optional[Sequence[str]]) -> Dict[str, str]:
    """Parse ``key=value`` argument lists (reference ``args_to_dict
    :128``)."""
    out: Dict[str, str] = {}
    if not args:
        return out
    for arg in args:
        if "=" in arg:
            k, v = arg.split("=", 1)
            out[k] = v
        else:
            out[arg] = "1"
    return out


def _parse_enum(enum_cls, name: Optional[str]):
    if not name:
        return None
    try:
        return enum_cls[name.upper()]
    except KeyError:
        raise SystemExit(
            f"unknown {enum_cls.__name__} task: {name}; options: "
            + ", ".join(e.name.lower() for e in enum_cls))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mm-tpu",
        description="MagellanMapper-TPU: TPU-native volumetric "
                    "microscopy pipeline")
    p.add_argument(
        "--version", action="store_true",
        help="show version information and exit (reference cli.py:262)")
    p.add_argument("--img", nargs="*", help="image path(s)")
    p.add_argument("--meta", nargs="*", help="metadata path(s)")
    p.add_argument("--prefix", help="output path prefix")
    p.add_argument(
        "--prefix_out", help="output path prefix when --prefix modifies "
        "the input path (reference cli.py:286)")
    p.add_argument("--suffix", help="output path suffix")
    p.add_argument("--channel", nargs="*", type=int, help="channel(s)")
    p.add_argument("--series", type=int, default=0, help="series index")
    p.add_argument("--subimg_offset", nargs="*", help="sub-image offset x,y,z")
    p.add_argument("--subimg_size", nargs="*", help="sub-image size x,y,z")
    p.add_argument("--offset", nargs="*", help="ROI offset x,y,z")
    p.add_argument("--size", nargs="*", help="ROI size x,y,z")
    p.add_argument("--db", help="database path")
    p.add_argument("--truth_db", nargs="*", help="truth DB mode and path")
    p.add_argument("--cpus", help="worker count (compat; unused on TPU)")
    p.add_argument(
        "--mesh", help="dp,sp[,spy] device mesh for sharded whole-volume "
        "detection over multiple TPU chips (TPU-native addition)")
    p.add_argument("--load", nargs="*", help="data to load")
    p.add_argument("--proc", nargs="*", help="processing task(s)")
    p.add_argument("--register", help="registration task")
    p.add_argument("--df", nargs="*", help="data-frame task")
    p.add_argument("--plot_2d", help="2D plot task")
    p.add_argument("--roi_profile", nargs="*", help="ROI profile(s)")
    p.add_argument("--atlas_profile", help="atlas profile")
    p.add_argument("--grid_search", help="grid search profile")
    p.add_argument("--theme", nargs="*", help="GUI theme (compat)")
    p.add_argument("--labels", nargs="*", help="labels args")
    p.add_argument("--transform", nargs="*", help="transform args "
                   "(rescale=, plane=, rotate=)")
    p.add_argument("--reg_suffixes", nargs="*",
                   help="registered image suffixes (atlas=..., "
                   "annotation=...)")
    p.add_argument("--plot_labels", nargs="*", help="plot labels")
    p.add_argument("--set_meta", nargs="*",
                   help="metadata overrides (resolutions=z,y,x ...)")
    p.add_argument("--classifier", nargs="*", help="classifier args")
    p.add_argument("--plane", help="plane orientation (xy/xz/yz)")
    p.add_argument("--show", action="store_true", help="show figures")
    p.add_argument("--alphas", nargs="*", help="channel alphas (compat)")
    p.add_argument("--vmin", nargs="*", help="display vmin (compat)")
    p.add_argument("--vmax", nargs="*", help="display vmax (compat)")
    p.add_argument("--rgb", action="store_true", help="RGB display")
    p.add_argument("--seed", type=int, help="random seed")
    p.add_argument("--save_subimg", action="store_true")
    p.add_argument("--slice", help="slice range (compat)")
    p.add_argument("--delay", type=int, help="animation delay")
    p.add_argument("--savefig", help="figure file format")
    p.add_argument("--groups", nargs="*", help="group names")
    p.add_argument("-v", "--verbose", nargs="*", help="verbosity")
    p.add_argument(
        "--ec2_start", nargs="*",
        help="AWS EC2 instance start: tag_name, ami_id, instance_type, "
             "subnet_id, sec_group, key_name, [count[, snapshot_ids...]]")
    p.add_argument("--ec2_list", nargs="*", help="AWS EC2 instance list")
    p.add_argument(
        "--ec2_terminate", nargs="*",
        help="AWS EC2 instance IDs to terminate")
    p.add_argument(
        "--notify", nargs="*",
        help="notification: URL [message [attachment-file]]")
    return p


def process_cli_args(argv: Optional[Sequence[str]] = None) -> RunConfig:
    """Parse args into a RunConfig (reference ``process_cli_args :253``)."""
    args = build_parser().parse_args(argv)
    if args.version:
        import magellanmapper_tpu
        print(f"MagellanMapper-TPU {magellanmapper_tpu.__version__}")
        raise SystemExit(0)
    rc = RunConfig()
    if args.img:
        rc.filenames = list(args.img)
    rc.channel = args.channel
    rc.series = args.series
    rc.prefix = args.prefix
    rc.suffix = args.suffix
    rc.db_path = args.db
    rc.plane = args.plane
    rc.classifier = args.classifier
    rc.savefig = args.savefig
    rc.save_subimg = args.save_subimg
    if getattr(args, "mesh", None):
        rc.mesh = [int(v) for v in str(args.mesh).split(",")]
    rc.verbose = args.verbose is not None
    if rc.verbose:
        logging.getLogger().setLevel(logging.DEBUG)
    if args.seed is not None:
        np.random.seed(args.seed)

    def parse_coords(vals):
        if not vals:
            return None
        return [[int(v) for v in val.split(",")] for val in vals]

    rc.subimg_offsets = parse_coords(args.subimg_offset)
    rc.subimg_sizes = parse_coords(args.subimg_size)
    offsets = parse_coords(args.offset)
    sizes = parse_coords(args.size)
    rc.offset = offsets[0] if offsets else None
    rc.size = sizes[0] if sizes else None

    if args.set_meta:
        meta = args_to_dict(args.set_meta)
        if "resolutions" in meta:
            rc.resolutions = [float(v) for v in
                              meta["resolutions"].split(",")]

    # profiles: comma-separated modifier chains, per-channel lists
    if args.roi_profile:
        for prof_names in args.roi_profile:
            prof = ROIProfile()
            prof.add_profiles(prof_names)
            rc.roi_profiles.append(prof)
        rc.roi_profile = rc.roi_profiles[0]
    if args.atlas_profile:
        rc.atlas_profile = AtlasProfile()
        rc.atlas_profile.add_profiles(args.atlas_profile)
    rc.grid_search = args.grid_search

    if args.proc:
        rc.proc = _parse_enum(ProcessTypes, args.proc[0])
        rc.proc_args = args_to_dict(args.proc[1:])
    rc.register_type = _parse_enum(RegisterTypes, args.register)
    rc.reg_suffixes = args_to_dict(args.reg_suffixes)
    rc.transform = args_to_dict(args.transform)
    rc.labels = args_to_dict(args.labels)
    rc.groups = args.groups
    if args.truth_db:
        rc.truth_db = args.truth_db[-1]
    rc.prefix_out = args.prefix_out
    rc.meta_paths = args.meta
    rc.load_data = args_to_dict(args.load)
    rc.plot_labels = args_to_dict(args.plot_labels)
    if args.slice:
        rc.slice_vals = [int(v) for v in args.slice.split(",")]
    rc.delay = args.delay
    rc.cpus = int(args.cpus) if args.cpus else None
    rc.show = bool(args.show)
    rc.theme = args.theme
    rc.alphas = [float(v) for v in args.alphas] if args.alphas else None
    rc.vmin = [float(v) for v in args.vmin] if args.vmin else None
    rc.vmax = [float(v) for v in args.vmax] if args.vmax else None
    rc.rgb = bool(args.rgb)
    rc.df_task = args.df
    rc.plot_2d_task = args.plot_2d
    # cloud tasks (reference cli.py:673-695)
    if args.ec2_start is not None:
        rc.ec2_start = args_with_dict(args.ec2_start)
    if args.ec2_list is not None:
        rc.ec2_list = args_with_dict(args.ec2_list)
    if args.ec2_terminate:
        rc.ec2_terminate = args.ec2_terminate
    if args.notify:
        rc.notify_url = args.notify[0]
        if len(args.notify) > 1:
            rc.notify_msg = args.notify[1]
        if len(args.notify) > 2:
            rc.notify_attach = args.notify[2]
    return rc


# ---------------------------------------------------------------------------
# task dispatch


def process_tasks(rc: RunConfig) -> Optional[object]:
    """Dispatch parsed tasks (reference ``process_tasks :874``);
    priority: register > notify > plot/df/grid > ec2 > proc."""
    if rc.register_type is not None:
        return _process_register(rc)
    if rc.notify_url:
        return _process_notify(rc)
    if rc.plot_2d_task:
        return _plot_2d(rc)
    if rc.df_task:
        return _df_task(rc)
    if rc.grid_search:
        return _grid_search(rc)
    if rc.ec2_start or rc.ec2_list or rc.ec2_terminate:
        return _process_aws(rc)
    if rc.proc is not None:
        return process_file(rc)
    _logger.info("no task specified; see --proc / --register")
    return None


def _process_notify(rc: RunConfig):
    """Webhook notification task (reference ``notify.main``, dispatched
    from ``process_tasks :885``)."""
    from magellanmapper_tpu.cloud import notify
    return notify.post(
        rc.notify_url, rc.notify_msg or "", rc.notify_attach)


def _process_aws(rc: RunConfig):
    """EC2 tasks (reference ``aws.main``, dispatched from
    ``process_tasks :893``); boto3 import is deferred so cloud deps
    stay optional."""
    from magellanmapper_tpu.cloud import aws
    out = None
    if rc.ec2_start:
        # reference aws.main: positional tag_name, ami_id, instance_type,
        # subnet_id, sec_group, key_name, [count], trailing key=val dict
        pos = [a for a in rc.ec2_start if not isinstance(a, dict)]
        kwargs = {}
        for a in rc.ec2_start:
            if isinstance(a, dict):
                kwargs.update(a)
        count = int(pos[6]) if len(pos) > 6 else 1
        out = aws.start_instances(
            image_id=pos[1] if len(pos) > 1 else kwargs.pop("ami_id"),
            instance_type=(pos[2] if len(pos) > 2
                           else kwargs.pop("instance_type")),
            count=count,
            key_name=pos[5] if len(pos) > 5 else kwargs.pop(
                "key_name", None))
    if rc.ec2_list:
        pos = [a for a in rc.ec2_list if not isinstance(a, dict)]
        state = pos[0] if pos else "running"
        out = aws.show_instances(state)
    if rc.ec2_terminate:
        aws.terminate_instances(rc.ec2_terminate)
        out = rc.ec2_terminate
    return out


def _load_image(rc: RunConfig):
    from magellanmapper_tpu.io import np_io
    path = rc.filenames[0]
    offset = rc.subimg_offsets[0] if rc.subimg_offsets else None
    size = rc.subimg_sizes[0] if rc.subimg_sizes else None
    img5d = np_io.read_file(path, rc.series, offset=offset, size=size)
    if rc.resolutions is not None:
        img5d.meta["resolutions"] = [rc.resolutions]
    return img5d


def process_file(rc: RunConfig):
    """Run the ``--proc`` task (reference ``process_file :1172``)."""
    from magellanmapper_tpu.io import np_io
    proc = rc.proc
    path = rc.filenames[0] if rc.filenames else None

    if proc is ProcessTypes.IMPORT_ONLY:
        from magellanmapper_tpu.io import importer
        ext = os.path.splitext(path)[1].lower()
        if ext == ".czi":
            return importer.import_czi(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions)
        if ext == ".lif":
            return importer.import_lif(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions, series=rc.series)
        if ext == ".nd2":
            return importer.import_nd2(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions)
        if ext == ".oib":
            return importer.import_oib(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions)
        if ext == ".oif":
            return importer.import_oif(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions)
        if ext == ".ims":
            return importer.import_ims(
                path, out_path=rc.prefix or path,
                resolutions=rc.resolutions)
        return importer.import_tiff(
            path, out_path=rc.prefix or path,
            resolutions=rc.resolutions)

    if proc in (ProcessTypes.DETECT, ProcessTypes.DETECT_COLOC):
        return _detect(rc, coloc=proc is ProcessTypes.DETECT_COLOC)

    if proc is ProcessTypes.COLOC_MATCH:
        return _coloc_match(rc)

    if proc is ProcessTypes.TRANSFORM:
        from magellanmapper_tpu.atlas import transformer
        rescale = rc.transform.get("rescale")
        return transformer.transpose_img(
            path, plane=rc.plane,
            rescale=float(rescale) if rescale else None,
            mesh=_reg_mesh(rc))

    if proc is ProcessTypes.PREPROCESS:
        from magellanmapper_tpu.atlas import transformer
        img5d = _load_image(rc)
        tasks = list(rc.proc_args)
        return transformer.preprocess_img(
            np.asarray(img5d.img), tasks, out_path=rc.prefix or path)

    if proc is ProcessTypes.EXPORT_TIF:
        from magellanmapper_tpu.io import tiff
        img5d = _load_image(rc)
        out = (rc.prefix or os.path.splitext(path)[0]) + ".tif"
        tiff.write_tiff(out, np.asarray(img5d.img[0]))
        return out

    if proc is ProcessTypes.EXPORT_RAW:
        img5d = _load_image(rc)
        out = (rc.prefix or os.path.splitext(path)[0]) + ".raw"
        np.asarray(img5d.img).tofile(out)
        return out

    if proc is ProcessTypes.EXPORT_BLOBS:
        from magellanmapper_tpu.io import export_rois
        return export_rois.blobs_to_csv(rc)

    if proc is ProcessTypes.LOAD:
        return _load_image(rc)

    if proc is ProcessTypes.CLASSIFY:
        return _classify(rc)

    if proc is ProcessTypes.EXTRACT:
        return _extract_plane(rc)

    if proc is ProcessTypes.EXPORT_ROIS:
        return _export_rois(rc)

    if proc is ProcessTypes.ANIMATED:
        img5d = _load_image(rc)
        from magellanmapper_tpu.io import export_stack
        base = rc.prefix or rc.filenames[0]
        vol = np.asarray(img5d.img)
        if rc.slice_vals:
            sl = slice(*rc.slice_vals)   # reference --slice start,stop[,step]
            vol = vol[:, sl] if vol.ndim >= 4 else vol[sl]
        fps = max(1, round(1000 / rc.delay)) if rc.delay else 10
        out = export_stack.animate_imgs(
            vol, f"{os.path.splitext(base)[0]}.gif", fps=fps,
            channel=rc.channel[0] if rc.channel else None)
        _logger.info("wrote animation %s", out)
        return out

    if proc in (ProcessTypes.EXPORT_PLANES,
                ProcessTypes.EXPORT_PLANES_CHANNELS):
        img5d = _load_image(rc)
        from magellanmapper_tpu.io import export_stack
        base = rc.prefix or rc.filenames[0]
        out_dir = f"{os.path.splitext(base)[0]}_planes"
        paths = export_stack.export_planes(
            np.asarray(img5d.img), out_dir,
            ext=rc.savefig or "png",
            channel=rc.channel[0] if rc.channel else None,
            separate_channels=(
                proc is ProcessTypes.EXPORT_PLANES_CHANNELS))
        _logger.info("exported %d planes to %s", len(paths), out_dir)
        return paths

    raise SystemExit(f"--proc {proc.name.lower()} is not supported yet")


def _classify(rc: RunConfig):
    """Classify saved blobs with the patch CNN and update their
    confirmed flags (reference CLASSIFY branch ``cli.py:1287``)."""
    from magellanmapper_tpu.cv import blobs as blobs_mod
    from magellanmapper_tpu.cv import classifier as classifier_mod
    from magellanmapper_tpu.utils import libmag

    img5d = _load_image(rc)
    base = rc.prefix or rc.filenames[0]
    blobs_path = libmag.combine_paths(base, "blobs.npz")
    blobs = blobs_mod.Blobs().load_blobs(blobs_path)
    if blobs.blobs is None or not len(blobs.blobs):
        _logger.warning("no blobs loaded to classify, skipping")
        return None
    model_path = (rc.classifier or [None])[0] if getattr(
        rc, "classifier", None) else None
    clf = (classifier_mod.BlobClassifier.load(model_path)
           if model_path else classifier_mod.BlobClassifier(seed=0))
    ci = classifier_mod.ClassifyImage(clf, np.asarray(img5d.img), blobs)
    blobs.blobs = ci.classify_whole_image()
    blobs.path = blobs_path
    blobs.save_archive()
    _logger.info(
        "classified %d blobs (%d confirmed)", len(blobs.blobs),
        int((blobs.blobs[:, 4] == 1).sum()))
    return blobs


def _extract_plane(rc: RunConfig):
    """Extract and save the single plane at the --offset z value
    (reference EXTRACT branch)."""
    from magellanmapper_tpu.plot import plot_support

    img5d = _load_image(rc)
    z = rc.offset[2] if rc.offset else 0   # offset is x,y,z
    plane, aspect, origin = plot_support.extract_planes(
        np.asarray(img5d.img), z, rc.plane or "xy")
    base = rc.prefix or rc.filenames[0]
    out = f"{os.path.splitext(base)[0]}_plane{rc.plane or 'xy'}{z}.npy"
    np.save(out, plane)
    _logger.info("extracted plane -> %s %s", out, plane.shape)
    return plane


def _export_rois(rc: RunConfig):
    """Export database truth ROIs as image + blob CSV pairs
    (reference EXPORT_ROIS branch)."""
    from magellanmapper_tpu.io import export_rois as export_rois_mod
    from magellanmapper_tpu.io import sqlite as sqlite_mod

    img5d = _load_image(rc)
    db = sqlite_mod.load_db(rc.truth_db or sqlite_mod.DB_NAME)
    base = rc.prefix or rc.filenames[0]
    out_dir = f"{os.path.splitext(base)[0]}_rois"
    vol = img5d.img[0] if img5d.img.ndim >= 4 else img5d.img
    df = export_rois_mod.export_rois(
        np.asarray(vol), db, rc.channel or [0], out_dir)
    db.close()
    _logger.info("exported %d ROIs to %s", len(df), out_dir)
    return df


def _detect(rc: RunConfig, coloc: bool = False):
    """Whole-image detection task (reference DETECT branch ``:1253``)."""
    from magellanmapper_tpu.cv import blobs as blobs_mod
    from magellanmapper_tpu.cv import colocalizer, stack_detect
    from magellanmapper_tpu.utils import libmag

    img5d = _load_image(rc)
    vol = img5d.img[0] if img5d.img.ndim >= 4 else img5d.img
    res = (img5d.resolutions[0] if img5d.resolutions is not None
           else (1.0, 1.0, 1.0))
    profiles = rc.roi_profiles or rc.roi_profile
    if rc.mesh:
        # multi-chip sharded whole-volume detection over a
        # (dp, sp[, spy]) mesh (--mesh; halo exchange over ICI)
        import time as time_mod
        from magellanmapper_tpu.parallel import halo
        m = _reg_mesh(rc)
        t0 = time_mod.time()
        merged = halo.detect_blobs_sharded_stack(
            np.asarray(vol), profiles, res, mesh=m,
            channels=rc.channel, preprocess=True)
        blobs = blobs_mod.Blobs(merged)
        blobs.resolutions = np.atleast_2d(np.asarray(res, float))
        timing = {"Detection": time_mod.time() - t0, "Pruning": 0.0,
                  "Total_stack": time_mod.time() - t0}
    else:
        blobs, timing = stack_detect.detect_blobs_stack(
            np.asarray(vol), profiles, res, channels=rc.channel)
    if coloc and blobs.blobs is not None and vol.ndim > 3:
        colocs = colocalizer.colocalize_blobs(
            np.asarray(vol), blobs.blobs)
        blobs.colocalizations = colocs

    # save blobs archive next to the image
    base = rc.prefix or rc.filenames[0]
    blobs.basename = os.path.basename(base)
    if rc.truth_db:
        # verify detections against a truth database
        # (reference truth-DB modes, cli.py:907 setup_dbs)
        from magellanmapper_tpu.cv import detector as det_mod
        from magellanmapper_tpu.io import sqlite as sqlite_mod
        truth_db = sqlite_mod.load_truth_db(rc.truth_db)
        truth = truth_db.select_blobs_confirmed(1)
        if len(truth):
            from magellanmapper_tpu.cv import verifier as verifier_mod
            tol = det_mod.calc_overlap(res) * np.asarray(
                rc.roi_profile["verify_tol_factor"])
            sens, ppv, msg = verifier_mod.verify_stack(
                blobs.blobs, truth, tol)
            _logger.info("verification vs truth DB:\n%s", msg)
            import pandas as pd
            pd.DataFrame([{"sens": sens, "ppv": ppv}]).to_csv(
                libmag.combine_paths(base, "verify.csv"), index=False)
        truth_db.close()

    if rc.save_subimg and img5d.subimg_offset is not None:
        # persist the extracted sub-image (reference --save_subimg)
        from magellanmapper_tpu.io import importer as importer_mod
        sub_name = importer_mod.make_subimage_name(
            base, img5d.subimg_offset[::-1], img5d.subimg_size[::-1])
        np.save(libmag.combine_paths(sub_name, "subimg.npy"),
                np.asarray(img5d.img[0]))

    blobs.path = libmag.combine_paths(base, "blobs.npz")
    blobs.save_archive()
    # stage timing CSV (reference stack_detection_times.csv,
    # stack_detect.py:500-515)
    import pandas as pd
    pd.DataFrame([{k: v for k, v in timing.items()
                   if isinstance(v, (int, float))}]).to_csv(
        libmag.combine_paths(base, "stack_detection_times.csv"),
        index=False)
    _logger.info(
        "Detected %d blobs in %.2fs (detection %.2fs, pruning %.2fs)",
        len(blobs), timing.get("Total_stack", 0),
        timing.get("Detection", 0), timing.get("Pruning", 0))
    return blobs


def _coloc_match(rc: RunConfig):
    from magellanmapper_tpu.cv import blobs as blobs_mod
    from magellanmapper_tpu.cv import colocalizer, detector
    from magellanmapper_tpu.utils import libmag

    img5d = _load_image(rc)
    base = rc.prefix or rc.filenames[0]
    blobs = blobs_mod.Blobs().load_blobs(
        libmag.combine_paths(base, "blobs.npz"))
    res = (img5d.resolutions[0] if img5d.resolutions is not None
           else (1.0, 1.0, 1.0))
    tol = detector.calc_overlap(res)
    shape = img5d.img.shape[1:4]
    return colocalizer.colocalize_blobs_match(
        blobs.blobs, (0, 0, 0), shape[::-1], tol)


def _reg_mesh(rc: RunConfig):
    """Build the (dp, sp[, spy]) device mesh from --mesh; shared by
    sharded detection, registration (sample-space sharding over all
    axes), and groupwise (subjects over dp)."""
    if not rc.mesh:
        return None
    from magellanmapper_tpu.parallel import mesh as mesh_mod
    dims = list(rc.mesh) + [1] * (3 - len(rc.mesh))
    dp, sp, spy = dims[:3]
    return mesh_mod.make_mesh(dp * sp * spy, dp=dp, sp=sp, spy=spy)


def _process_register(rc: RunConfig):
    """Dispatch ``--register`` tasks (reference ``register.main :2141``)."""
    from magellanmapper_tpu.atlas import register as register_mod
    task = rc.register_type
    if task is RegisterTypes.SINGLE:
        return register_mod.register(
            rc.filenames[0], rc.filenames[1], rc.atlas_profile,
            prefix=rc.prefix, reg_suffixes=rc.reg_suffixes or None,
            mesh=_reg_mesh(rc))
    if task is RegisterTypes.REGISTER_REV:
        return register_mod.register_rev(
            rc.filenames[0], rc.filenames[1], rc.atlas_profile,
            prefix=rc.prefix, mesh=_reg_mesh(rc))
    if task is RegisterTypes.GROUP:
        from magellanmapper_tpu.io import np_io
        imgs = [np.asarray(np_io.read_file(f).img[0])
                for f in rc.filenames]
        return register_mod.register_group(
            imgs, rc.atlas_profile, mesh=_reg_mesh(rc))
    if task is RegisterTypes.IMPORT_ATLAS:
        from magellanmapper_tpu.atlas import atlas_refiner
        return atlas_refiner.import_atlas(
            rc.filenames[0], rc.atlas_profile, prefix=rc.prefix)
    if task is RegisterTypes.MAKE_EDGE_IMAGES:
        from magellanmapper_tpu.atlas import edge_seg
        from magellanmapper_tpu.io import sitk_io
        import numpy as np_
        path = rc.filenames[0]
        atlas = sitk_io.load_registered_img(path, "atlasVolume.mhd")
        labels = sitk_io.load_registered_img(path, "annotation.mhd")
        imgs = edge_seg.make_edge_images(
            atlas, labels, log_sigma=rc.atlas_profile["log_sigma"])
        # write the edge/distance set under the RegNames vocabulary
        # erode labels into watershed markers/interiors too
        eros = rc.atlas_profile[
            "edge_aware_reannotation"]["marker_erosion"]
        markers, interior, _ = edge_seg.erode_labels(
            labels, filter_size=int(eros))
        sitk_io.write_reg_images({
            "atlasEdge.mhd": sitk_io.MedImage(
                imgs["atlas_edge"].astype(np_.uint8)),
            "atlasLoG.mhd": sitk_io.MedImage(
                imgs["atlas_log"].astype(np_.float32)),
            "annotationEdge.mhd": sitk_io.MedImage(
                imgs["labels_edge"].astype(np_.uint8)),
            "annotationDist.mhd": sitk_io.MedImage(
                imgs["dist_to_edge"].astype(np_.float32)),
            "annotationMarkers.mhd": sitk_io.MedImage(
                markers.astype(np_.int32)),
            "annotationInterior.mhd": sitk_io.MedImage(
                interior.astype(np_.int32)),
        }, rc.prefix or path)
        return imgs
    if task is RegisterTypes.VOL_STATS:
        return _vol_stats(rc)
    if task is RegisterTypes.MERGE_ATLAS_SEGS:
        from magellanmapper_tpu.atlas import edge_seg
        from magellanmapper_tpu.io import sitk_io
        import numpy as np_
        outs = []
        for path in rc.filenames:
            atlas = sitk_io.load_registered_img(path, "atlasVolume.mhd")
            labels = sitk_io.load_registered_img(path, "annotation.mhd")
            seg, metr = edge_seg.edge_aware_segmentation(
                atlas, labels,
                log_sigma=rc.atlas_profile["log_sigma"])
            sitk_io.write_med_img(
                sitk_io.reg_out_path(path, "annotation.mhd"),
                sitk_io.MedImage(seg.astype(np_.int32)))
            _logger.info("reannotated %s: %s", path, metr)
            outs.append(metr)
        return outs
    if task is RegisterTypes.MAKE_SUBSEGS:
        from magellanmapper_tpu.atlas import edge_seg
        from magellanmapper_tpu.io import sitk_io
        import numpy as np_
        path = rc.filenames[0]
        labels = sitk_io.load_registered_img(path, "annotation.mhd")
        edges = sitk_io.load_registered_img(path, "atlasEdge.mhd")
        sub = edge_seg.make_sub_segmented_labels(labels, edges)
        sitk_io.write_med_img(
            sitk_io.reg_out_path(rc.prefix or path,
                                 "annotationSubseg.mhd"),
            sitk_io.MedImage(sub.astype(np_.int32)))
        return sub
    if task is RegisterTypes.EXPORT_COMMON_LABELS:
        from magellanmapper_tpu.io import export_regions
        out = (rc.prefix or "regions_common.csv")
        return export_regions.export_common_labels(rc.filenames, out)
    if task is RegisterTypes.CONVERT_ITKSNAP_LABELS:
        from magellanmapper_tpu.atlas import ontology
        df = ontology.convert_itksnap_to_df(rc.filenames[0])
        out = rc.prefix or (rc.filenames[0] + ".csv")
        df.to_csv(out, index=False)
        return df
    if task is RegisterTypes.EXPORT_REGIONS:
        from magellanmapper_tpu.atlas import ontology
        from magellanmapper_tpu.io import export_regions
        ref_path = rc.labels.get("path_ref") or rc.filenames[0]
        ref = ontology.LabelsRef(str(ref_path)).load()
        out = rc.prefix or "region_ids.csv"
        level = rc.labels.get("level")
        return export_regions.export_region_ids(
            ref, out, int(level) if level else None)
    if task is RegisterTypes.MAKE_DENSITY_IMAGES:
        from magellanmapper_tpu.io import export_regions
        if len(rc.filenames) > 1:
            return export_regions.make_density_images_mp(rc.filenames)
        return export_regions.make_density_image(rc.filenames[0])
    if task is RegisterTypes.OVERLAYS:
        return register_mod.overlay_registered_imgs(
            rc.filenames[0],
            rc.filenames[1] if len(rc.filenames) > 1 else None,
            plane=rc.plane, name_prefix=rc.prefix,
            out_path=(rc.prefix or rc.filenames[0]) + "_overlay.png")
    if task is RegisterTypes.VOL_COMPARE:
        return register_mod.volumes_by_id_compare(
            rc.filenames, rc.labels.get("path_ref"))
    if task is RegisterTypes.NEW_ATLAS:
        # curate an imported atlas into a new atlas directory without
        # registration (reference new_atlas flow: import + truncate/
        # mirror per profile, then save under the prefix)
        from magellanmapper_tpu.atlas import atlas_refiner
        return atlas_refiner.import_atlas(
            rc.filenames[0], rc.atlas_profile,
            prefix=rc.prefix or (rc.filenames[0] + "_new"))
    if task in (RegisterTypes.MAKE_EDGE_IMAGES_EXP,
                RegisterTypes.MERGE_ATLAS_SEGS_EXP):
        # experiment-image flavors use the exp intensity image instead
        # of the atlas (reference suffix-EXP tasks)
        rc.reg_suffixes = dict(rc.reg_suffixes or {})
        rc.reg_suffixes.setdefault("atlas", "exp.mhd")
        rc.register_type = (
            RegisterTypes.MAKE_EDGE_IMAGES
            if task is RegisterTypes.MAKE_EDGE_IMAGES_EXP
            else RegisterTypes.MERGE_ATLAS_SEGS)
        return _process_register(rc)
    if task in (RegisterTypes.MERGE_IMAGES,
                RegisterTypes.MERGE_IMAGES_CHANNELS):
        from magellanmapper_tpu.io import sitk_io
        suffix = (rc.reg_suffixes or {}).get("atlas", "atlasVolume.mhd")
        fn = np.sum if task is RegisterTypes.MERGE_IMAGES else None
        med = sitk_io.merge_images(rc.filenames, suffix, fn_combine=fn)
        if med is not None:
            out = sitk_io.reg_out_path(
                rc.prefix or rc.filenames[0], "combined.mhd")
            img = med.img
            if img.ndim > 3:
                # channels flavor stacks samples along a channel axis;
                # write each as its own volume
                img = np.moveaxis(img, 0, -1)
            sitk_io.write_med_img(out, sitk_io.MedImage(
                np.asarray(img, np.float32)))
        return med
    if task in (RegisterTypes.LABELS_DIFF,
                RegisterTypes.LABELS_DIFF_STATS):
        from magellanmapper_tpu.io import sitk_io
        from magellanmapper_tpu.stats import vols
        labels_imgs = [
            sitk_io.load_registered_img(p, "annotation.mhd")
            for p in rc.filenames[:2]]
        df = vols.measure_labels_overlap(labels_imgs)
        if task is RegisterTypes.LABELS_DIFF:
            diff = (labels_imgs[0] != labels_imgs[1]).astype(np.int32)
            sitk_io.write_med_img(
                sitk_io.reg_out_path(
                    rc.prefix or rc.filenames[0], "annotationDiff.mhd"),
                sitk_io.MedImage(diff))
        out = os.path.splitext(rc.prefix or rc.filenames[0])[0] \
            + "_labels_diff.csv"
        df.to_csv(out, index=False)
        return df
    if task is RegisterTypes.MAKE_LABELS_LEVEL:
        from magellanmapper_tpu.atlas import ontology
        from magellanmapper_tpu.io import export_regions, sitk_io
        path = rc.filenames[0]
        labels = sitk_io.load_registered_img(path, "annotation.mhd")
        ref = ontology.LabelsRef(str(rc.labels.get("path_ref"))).load()
        level = int(rc.labels.get("level") or 0)
        out = sitk_io.reg_out_path(
            rc.prefix or path, f"annotationLevel{level}.mhd")
        return export_regions.make_labels_level_img(
            labels, ref, level, out)
    if task is RegisterTypes.LABELS_DIST:
        from magellanmapper_tpu.io import sitk_io
        from magellanmapper_tpu.stats import vols
        paths = rc.filenames[:2] if len(rc.filenames) > 1 else \
            [rc.filenames[0], rc.filenames[0]]
        suffixes = ("annotation.mhd",
                    "annotation.mhd" if len(rc.filenames) > 1
                    else "annotationEdit.mhd")
        labels_imgs = [sitk_io.load_registered_img(p, s)
                       for p, s in zip(paths, suffixes)]
        df = vols.labels_distance(labels_imgs[0], labels_imgs[1])
        out = (rc.prefix or rc.filenames[0]) + "_labels_dist.csv"
        df.to_csv(out, index=False)
        return df
    if task is RegisterTypes.SMOOTHING_METRICS_AGGR:
        from magellanmapper_tpu.atlas import atlas_refiner
        import pandas as pd
        df = pd.read_csv(rc.filenames[0])
        out = atlas_refiner.aggr_smoothing_metrics(df)
        out.to_csv((rc.prefix or rc.filenames[0]) + "_aggr.csv",
                   index=False)
        return out
    if task is RegisterTypes.SMOOTHING_PEAKS:
        from magellanmapper_tpu.stats import atlas_stats
        import pandas as pd
        df = pd.read_csv(rc.filenames[0])
        qcol = "SmoothingQuality" if "SmoothingQuality" in df.columns \
            else "Smoothing_quality"
        fcol = "Filter" if "Filter" in df.columns else "Filter_size"
        return atlas_stats.smoothing_peak(df, qcol, fcol)
    if task in (RegisterTypes.PLOT_SMOOTHING_METRICS,
                RegisterTypes.EXPORT_METRICS_COMPACTNESS):
        import pandas as pd
        from magellanmapper_tpu.plot import plot_2d
        df = pd.read_csv(rc.filenames[0])
        xcol = "Filter_size" if "Filter_size" in df.columns else \
            df.columns[0]
        ycol = "Compactness" if "Compactness" in df.columns else \
            df.columns[-1]
        out = (rc.prefix or rc.filenames[0]) + "_metrics.png"
        plot_2d.plot_lines(df, xcol, [ycol], path=out)
        return df
    if task is RegisterTypes.COMBINE_COLS:
        import pandas as pd
        from magellanmapper_tpu.io import df_io
        from magellanmapper_tpu.stats import vols
        df = pd.read_csv(rc.filenames[0])
        out = df_io.combine_cols(df, list(vols.MetricCombos))
        out.to_csv((rc.prefix or rc.filenames[0]) + "_combined.csv",
                   index=False)
        return out
    if task is RegisterTypes.ZSCORES:
        from magellanmapper_tpu.stats import atlas_stats, vols
        metric_cols = [m.name for m in vols.VAR_METRICS]
        return atlas_stats.meas_plot_zscores(
            rc.filenames[0], metric_cols, ["Region"],
            [vols.MetricCombos.HOMOGENEITY])
    if task is RegisterTypes.COEFVAR:
        from magellanmapper_tpu.stats import atlas_stats
        return atlas_stats.meas_plot_coefvar(
            rc.filenames[0], ["Region"], "Condition", None, ["Volume"])
    if task is RegisterTypes.MELT_COLS:
        import pandas as pd
        from magellanmapper_tpu.io import df_io
        df = pd.read_csv(rc.filenames[0])
        id_cols = [c for c in ("Sample", "Region") if c in df.columns]
        melt_cols_ = [c for c in df.columns if c not in id_cols]
        out = df_io.melt_cols(df, id_cols, melt_cols_)
        out.to_csv((rc.prefix or rc.filenames[0]) + "_melted.csv",
                   index=False)
        return out
    if task is RegisterTypes.PIVOT_CONDS:
        import pandas as pd
        from magellanmapper_tpu.io import df_io
        df = pd.read_csv(rc.filenames[0])
        piv, _ = df_io.pivot_with_conditions(
            df, "Sample", "Condition",
            "Volume" if "Volume" in df.columns else df.columns[-1])
        piv.to_csv((rc.prefix or rc.filenames[0]) + "_pivoted.csv")
        return piv
    if task is RegisterTypes.MEAS_IMPROVEMENT:
        from magellanmapper_tpu.stats import atlas_stats
        cols = rc.proc_args or {}
        return atlas_stats.meas_improvement(
            rc.filenames[0], cols.get("col_effect", "Effect"),
            cols.get("col_p", "P"), col_wt=cols.get("col_wt"))
    if task is RegisterTypes.PLOT_REGION_DEV:
        import pandas as pd
        from magellanmapper_tpu.stats import atlas_stats
        return atlas_stats.plot_region_development(
            "Volume", pd.read_csv(rc.filenames[0]))
    if task is RegisterTypes.PLOT_LATERAL_UNLABELED:
        from magellanmapper_tpu.stats import atlas_stats
        return atlas_stats.plot_unlabeled_hemisphere(
            rc.filenames[0], ["Unlabeled"])
    if task is RegisterTypes.PLOT_INTENS_NUC:
        import pandas as pd
        from magellanmapper_tpu.stats import atlas_stats
        return atlas_stats.plot_intensity_nuclei(
            rc.filenames, ["DensityIntens", "Density"])
    if task is RegisterTypes.CLUSTER_BLOBS:
        from magellanmapper_tpu.cv import blobs as blobs_mod
        from magellanmapper_tpu.stats import clustering
        from magellanmapper_tpu.utils import libmag
        b = blobs_mod.Blobs().load_blobs(
            libmag.combine_paths(rc.filenames[0], "blobs.npz"))
        clustered, stats = clustering.cluster_blobs(b.blobs)
        _logger.info("clustering stats: %s", stats)
        np.save((rc.prefix or rc.filenames[0]) + "_clusters.npy",
                clustered)
        return clustered
    if task is RegisterTypes.PLOT_KNNS:
        from magellanmapper_tpu.cv import blobs as blobs_mod
        from magellanmapper_tpu.stats import clustering
        from magellanmapper_tpu.utils import libmag
        blob_sets = []
        for path in rc.filenames:
            b = blobs_mod.Blobs().load_blobs(
                libmag.combine_paths(path, "blobs.npz"))
            if b.blobs is not None:
                blob_sets.append(b.blobs)
        out = (rc.prefix or rc.filenames[0]) + "_knn.png"
        return clustering.plot_knns(blob_sets, out_path=out)
    if task is RegisterTypes.PLOT_CLUSTER_BLOBS:
        from magellanmapper_tpu.stats import atlas_stats
        from magellanmapper_tpu.utils import libmag
        path = libmag.combine_paths(rc.filenames[0], "blobs.npz")
        z = rc.offset[2] if rc.offset else 0
        return atlas_stats.plot_clusters_by_label(path, z)
    raise SystemExit(
        f"--register {task.name.lower()} is not supported yet")


def _vol_stats(rc: RunConfig):
    from magellanmapper_tpu.atlas import ontology
    from magellanmapper_tpu.io import sitk_io
    from magellanmapper_tpu.stats import vols
    path = rc.filenames[0]
    atlas = sitk_io.load_registered_img(path, "atlasVolume.mhd")
    labels = sitk_io.load_registered_img(path, "annotation.mhd")
    heat = None
    try:
        heat = sitk_io.load_registered_img(path, "heat.mhd")
    except FileNotFoundError:
        pass
    ref = None
    ref_path = rc.labels.get("path_ref")
    if ref_path:
        ref = ontology.LabelsRef(str(ref_path)).load()
    df = vols.measure_labels_metrics(
        atlas, labels, heat_map=heat, labels_ref=ref,
        mesh=_reg_mesh(rc))
    out_csv = (rc.prefix or os.path.splitext(path)[0]) + "_vols.csv"
    df.to_csv(out_csv, index=False)
    return df


def _df_task(rc: RunConfig):
    """Dispatch a --df task over CSV inputs (reference df_io.main)."""
    import pandas as pd
    from magellanmapper_tpu.io import df_io
    task = _parse_enum(df_io.DFTasks, rc.df_task[0])
    paths = rc.df_task[1:] or rc.filenames
    if task is df_io.DFTasks.MERGE_CSVS:
        return df_io.merge_csvs(paths, rc.prefix)
    if task is df_io.DFTasks.MELT_COLS:
        df = pd.read_csv(paths[0])
        id_cols = str(rc.labels.get("id_cols", "Region")).split(",")
        melt_cols = str(rc.labels.get("melt_cols", "")).split(",")
        out = df_io.melt_cols(df, id_cols, melt_cols)
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task is df_io.DFTasks.ZSCORE:
        df = pd.read_csv(paths[0])
        group_cols = str(rc.labels.get("group_cols", "Region")).split(",")
        metric_cols = str(rc.labels.get("metric_cols", "Volume")).split(",")
        out = df_io.zscore_df(df, group_cols, metric_cols)
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task is df_io.DFTasks.APPEND_CSVS_COLS:
        dfs = [pd.read_csv(p_) for p_ in paths]
        labels = rc.groups or [str(i) for i in range(len(dfs))]
        out = df_io.append_cols(dfs, labels)
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task is df_io.DFTasks.MERGE_CSVS_COLS:
        dfs = [pd.read_csv(p_) for p_ in paths]
        on = str(rc.labels.get("id_col", "Sample"))
        out = df_io.join_dfs(dfs, on)
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task is df_io.DFTasks.EXPS_BY_REGION:
        return df_io.exps_by_regions(paths[0])
    if task is df_io.DFTasks.PIVOT_TABLE:
        df = pd.read_csv(paths[0])
        out = df_io.pivot_table(
            df, str(rc.labels.get("index", df.columns[0])),
            str(rc.labels.get("columns", df.columns[1])),
            str(rc.labels.get("values", df.columns[-1])))
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task in (df_io.DFTasks.SUM_COLS, df_io.DFTasks.SUBTRACT_COLS,
                df_io.DFTasks.MULTIPLY_COLS, df_io.DFTasks.DIVIDE_COLS):
        df = pd.read_csv(paths[0])
        col1 = str(rc.labels.get("col1", df.columns[-2]))
        col2 = str(rc.labels.get("col2", df.columns[-1]))
        fn = {df_io.DFTasks.SUM_COLS: np.add,
              df_io.DFTasks.SUBTRACT_COLS: np.subtract,
              df_io.DFTasks.MULTIPLY_COLS: np.multiply,
              df_io.DFTasks.DIVIDE_COLS: np.divide}[task]
        name = rc.labels.get("name") or f"{col1}_{task.name.lower()}"
        df_io.func_to_paired_cols(df, col1, col2, fn, str(name))
        if rc.prefix:
            df_io.data_frames_to_csv(df, rc.prefix)
        return df
    if task is df_io.DFTasks.NORMALIZE:
        df = pd.read_csv(paths[0])
        out = df_io.normalize_df(
            df, str(rc.labels.get("id_cols", "Region")).split(","),
            str(rc.labels.get("cond_col", "Condition")),
            str(rc.labels.get("cond_base", "ctl")),
            str(rc.labels.get("metric_cols", "Volume")).split(","))
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    if task is df_io.DFTasks.REPLACE_VALS:
        df = pd.read_csv(paths[0])
        out = df_io.replace_vals(
            df, rc.labels.get("vals_from"), rc.labels.get("vals_to"),
            rc.labels.get("cols"))
        if rc.prefix:
            df_io.data_frames_to_csv(out, rc.prefix)
        return out
    raise SystemExit(f"--df {task.name.lower()} is not supported yet")


def _plot_2d(rc: RunConfig):
    """Dispatch a --plot_2d task over a CSV input."""
    import pandas as pd
    from magellanmapper_tpu.plot import plot_2d
    task = _parse_enum(plot_2d.Plot2DTypes, rc.plot_2d_task)
    df = pd.read_csv(rc.filenames[0])
    out_path = rc.prefix or (rc.filenames[0] + ".png")
    if task is plot_2d.Plot2DTypes.ROC_CURVE:
        return plot_2d.plot_roc(df, out_path)
    x_col = str(rc.labels.get(
        "x_col", rc.plot_labels.get("x_col", df.columns[0])))
    y_col = str(rc.labels.get(
        "y_col", rc.plot_labels.get("y_col", df.columns[1])))
    if task is plot_2d.Plot2DTypes.BAR_PLOT:
        return plot_2d.plot_bars(df, x_col, y_col, out_path)
    if task is plot_2d.Plot2DTypes.LINE_PLOT:
        return plot_2d.plot_lines(df, x_col, [y_col], out_path)
    if task is plot_2d.Plot2DTypes.SWARM_PLOT:
        return plot_2d.plot_swarm(df, x_col, y_col, out_path)
    if task is plot_2d.Plot2DTypes.CAT_PLOT:
        return plot_2d.plot_catplot(df, x_col, y_col, out_path=out_path)
    if task in (plot_2d.Plot2DTypes.BAR_PLOT_VOLS_STATS,
                plot_2d.Plot2DTypes.BAR_PLOT_VOLS_STATS_EFFECTS):
        ycol = "Volume" if "Volume" in df.columns else y_col
        return plot_2d.plot_bars(
            df, x_col if x_col in df.columns else "Region", ycol,
            out_path)
    if task is plot_2d.Plot2DTypes.HISTOGRAM:
        return plot_2d.plot_histogram(df, y_col, path=out_path)
    return plot_2d.plot_scatter(df, x_col, y_col, path=out_path)


def _grid_search(rc: RunConfig):
    from magellanmapper_tpu.stats import mlearn
    return mlearn.grid_search_from_cli(rc)


def main(argv: Optional[Sequence[str]] = None):
    """CLI entry (reference ``cli.main :978``)."""
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s:%(name)s: %(message)s")
    rc = process_cli_args(argv)
    return process_tasks(rc)


if __name__ == "__main__":
    main()


def args_with_dict(args: Sequence[str]) -> list:
    """Split a mixed argument list into positional values plus one dict
    of ``key=value`` entries; comma-separated values become lists, ints
    parse where possible (reference ``cli.args_with_dict :94``)."""
    from magellanmapper_tpu.utils import libmag
    parsed = []
    args_dict: Dict[str, object] = {}
    for arg in args:
        parts = arg.split("=")
        if len(parts) == 1:
            parsed.append(libmag.get_int(arg))
        else:
            vals = parts[1].split(",")
            vals = [libmag.get_int(v) for v in vals]
            args_dict[parts[0]] = vals if len(vals) > 1 else vals[0]
    parsed.append(args_dict)
    return parsed


def setup_image(rc: RunConfig):
    """Load the main image per the run config
    (reference ``cli.process_cli_args`` image setup flow); returns the
    :class:`magellanmapper_tpu.io.np_io.Image5d`."""
    return _load_image(rc)


def setup_dbs(rc: RunConfig):
    """Open the main (and truth) databases
    (reference ``cli.setup_dbs``)."""
    from magellanmapper_tpu.io import sqlite as sqlite_mod
    db = sqlite_mod.load_db(getattr(rc, "db_path", None)
                            or sqlite_mod.DB_NAME)
    truth = None
    if getattr(rc, "truth_db", None):
        truth = sqlite_mod.load_truth_db(rc.truth_db)
    return db, truth


def setup_roi_profiles(names) -> list:
    """Build per-channel ROI profiles from name strings
    (reference ``cli.setup_roi_profiles``)."""
    from magellanmapper_tpu.settings.roi_prof import ROIProfile
    profs = []
    for name in names or ("default",):
        prof = ROIProfile()
        if name and name != "default":
            prof.add_profiles(name)
        profs.append(prof)
    return profs


def setup_atlas_profiles(name: Optional[str] = None):
    """Build the atlas profile from a modifier string
    (reference ``cli.setup_atlas_profiles``)."""
    from magellanmapper_tpu.settings.atlas_prof import AtlasProfile
    prof = AtlasProfile()
    if name and name != "default":
        prof.add_profiles(name)
    return prof


def setup_grid_search_profiles(name: Optional[str] = None):
    """Build the grid-search profile
    (reference ``cli.setup_grid_search_profiles``)."""
    from magellanmapper_tpu.settings.grid_search_prof import \
        GridSearchProfile
    prof = GridSearchProfile()
    if name:
        prof.add_profiles(name)
    return prof


def update_profiles(rc: RunConfig):
    """Re-apply profile modifiers from the run config
    (reference ``cli.update_profiles``)."""
    rc.roi_profiles = setup_roi_profiles(
        getattr(rc, "roi_profile_names", None))
    rc.atlas_profile = setup_atlas_profiles(
        getattr(rc, "atlas_profile_name", None))
    return rc


def setup_labels(labels_path: Optional[str], level=None):
    """Load the labels reference lookup
    (reference ``cli.setup_labels``)."""
    from magellanmapper_tpu.atlas import ontology
    if not labels_path:
        return None
    ref = ontology.LabelsRef(labels_path).load()
    return ref


def process_proc_tasks(rc: RunConfig):
    """Run the ``--proc`` task chain (reference
    ``cli.process_proc_tasks``); alias of :func:`process_tasks`."""
    return process_tasks(rc)


def shutdown() -> None:
    """Flush logging and exit cleanly (reference ``cli.shutdown``)."""
    import logging
    logging.shutdown()
