"""Headline benchmark: whole-volume 3D LoG blob detection throughput.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: megavoxels/second for the full detection pipeline (LoG pyramid over
``num_sigma`` scales + 4D peak finding + overlap pruning) on the real TPU
chip, steady state. Baseline: the same algorithm on CPU via scipy.ndimage
(``cv/ref_detect.py``) — the reference's own hot kernel is this algorithm
inside scikit-image (``magmap/cv/detector.py:931``), and the reference
publishes no numbers of its own (BASELINE.md), so vs_baseline is measured
TPU Mvox/s over measured single-CPU Mvox/s on the same workload.
"""

import json
import os
import sys
import threading
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (verified working through the
    axon remote backend): repeated bench runs skip the multi-minute
    remote compiles, which previously dominated the registration
    full-schedule wall time (BENCH_r02: 145 s total for ~25 s of
    optimizer steps)."""
    import jax
    cache_dir = os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_device_capability():
    """Measured device ceilings for normalizing the workload numbers.

    The axon tunnel exposes a v5e slice whose MEASURED capability is far
    below the v5e datasheet (819 GB/s HBM, 197 bf16 TFLOP/s): a plain
    268 MB reduction and a 4096^3 GEMM give the practical memory-BW and
    MXU ceilings this bench actually runs against. The detection
    pipeline's ~10 ms LoG pyramid is at this slice's measured matmul
    speed-of-light (275 GFLOP / ~28 TF/s at 3-pass HIGH precision).
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).random(
        (8, 128, 256, 256), dtype=np.float32))
    a = jnp.asarray(np.random.default_rng(1).random(
        (4096, 4096), dtype=np.float32))

    def timed(fn, *args, iters=8):
        @jax.jit
        def chain(*q):
            def body(i, acc):
                return acc + fn(*[v + acc * jnp.float32(1e-30)
                                  for v in q])
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        float(np.asarray(chain(*args)))
        t0 = time.perf_counter()
        float(np.asarray(chain(*args)))
        return (time.perf_counter() - t0) / iters

    bw = x.size * 4 / 1e9 / timed(lambda v: jnp.sum(v), x)
    tf = 2 * 4096 ** 3 / 1e12 / timed(
        lambda q: jnp.sum(q @ q * jnp.float32(1e-30)), a)
    return round(bw, 1), round(tf, 1)


def make_volume(shape=(128, 256, 256), n_blobs=600, seed=0):
    rng = np.random.default_rng(seed)
    vol = rng.normal(scale=0.02, size=shape).astype(np.float32)
    coords = np.column_stack(
        [rng.integers(6, s - 6, n_blobs) for s in shape])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, n_blobs)):
        sig = r / np.sqrt(3)
        stamp = np.exp(-(zz**2 + yy**2 + xx**2) / (2 * sig**2))
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += stamp
    vol = np.clip(vol, 0, None)
    return vol / vol.max()


def bench_tpu(vol, sigmas, threshold, overlap, capacity, iters=8):
    """Sustained on-device detection throughput.

    Chains ``iters`` full detections inside one jitted ``fori_loop``
    (each on a slightly perturbed input so XLA cannot fold them) and
    pulls one scalar at the end: over the remote-TPU tunnel a per-
    iteration D2H pull costs ~33 ms of RTT, which would otherwise be
    half the measured time at this volume size. This mirrors production
    behavior, where consecutive blocks stream without host syncs.
    """
    import jax
    import jax.numpy as jnp
    from magellanmapper_tpu.cv import detector

    x = jnp.asarray(vol)
    sig = tuple(sigmas)
    # warmup/compile + blob count for the report
    raw, valid = detector.blob_log(x, sig, threshold, overlap, capacity)
    n_blobs = int(np.asarray(valid).sum())

    @jax.jit
    def run_chain(x):
        def body(i, acc):
            xi = x + acc * jnp.float32(1e-20) + i * jnp.float32(0.0)
            raw, valid = detector.blob_log(
                xi, sig, threshold, overlap, capacity)
            return acc + valid.sum() + raw[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(np.asarray(run_chain(x)))   # compile the chained program
    t0 = time.perf_counter()
    float(np.asarray(run_chain(x)))   # one pull for the whole chain
    dt = (time.perf_counter() - t0) / iters
    return vol.size / dt / 1e6, n_blobs


def bench_cpu_baseline(vol, sigmas, threshold, overlap, repeats=2):
    """Single-CPU scipy baseline on a sub-volume, extrapolated per-voxel.

    Takes the fastest of ``repeats`` runs (the shared CPU core is noisy;
    the fastest run is the most conservative comparison point)."""
    from magellanmapper_tpu.cv import ref_detect
    sub = vol[:32, :128, :128]
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        ref_detect.blob_log_reference(
            sub, float(sigmas[0]), float(sigmas[-1]), len(sigmas),
            threshold, overlap)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return sub.size / best / 1e6


def bench_block_path(shape=(128, 512, 512), n_blobs=1500, seed=1):
    """Production block-path throughput: ``detect_blobs_blocks`` on a
    memmapped uint16 volume, end-to-end (gather + H2D + detect + prune).

    Returns ``(e2e_mvox_s, device_mvox_s, n_blobs)``. Over the dev
    tunnel the end-to-end figure is H2D-bound (~50-100 MB/s link); the
    device figure times the same batched detection program on pre-staged
    device data — the compute rate a local PCIe host would see.
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    from magellanmapper_tpu.cv import stack_detect
    from magellanmapper_tpu.settings.roi_prof import ROIProfile

    rng = np.random.default_rng(seed)
    path = os.path.join(tempfile.gettempdir(), "bench_block_vol.npy")
    vol = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.uint16, shape=shape)
    for z0 in range(0, shape[0], 64):
        z1 = min(shape[0], z0 + 64)
        vol[z0:z1] = (rng.random((z1 - z0,) + shape[1:]) * 800).astype(
            np.uint16)
    coords = np.column_stack(
        [rng.integers(7, s - 7, n_blobs) for s in shape])
    zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
    for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, n_blobs)):
        sig = r / np.sqrt(3)
        stamp = np.exp(-(zz**2 + yy**2 + xx**2) / (2 * sig**2))
        vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += (
            stamp * 40000).astype(np.uint16)
    vol.flush()

    prof = ROIProfile()
    res = (1.0, 1.0, 1.0)
    # warm the compile cache with the same shapes, then time end-to-end
    stack_detect.detect_blobs_blocks(vol, prof, res, preprocess=True)
    t0 = time.perf_counter()
    blobs, timing = stack_detect.detect_blobs_blocks(
        vol, prof, res, preprocess=True)
    e2e = vol.size / (time.perf_counter() - t0) / 1e6
    # bottleneck decomposition of the e2e run (host gather overlapped by
    # the two-deep pipeline vs time blocked on device result pulls)
    e2e_split = {
        "gather_host_s": round(timing.get("Gather_host", 0.0), 2),
        "stage_h2d_s": round(timing.get("Stage_h2d", 0.0), 2),
        "pull_wait_s": round(timing.get("Pull_wait", 0.0), 2),
        "detect_s": round(timing.get("Detection", 0.0), 2),
        "prune_s": round(timing.get("Pruning", 0.0), 2)}

    # device-only rate on one pre-staged batch of production blocks —
    # identical static args/dtype to the dispatcher's program (batch 6 =
    # its HBM-budget choice here), so this reuses the compiled executable
    blocks = stack_detect.setup_blocks(prof, shape, res)
    bshape = np.minimum(blocks.max_pixels + blocks.overlap, shape)
    batch = jnp.asarray(np.stack(
        [vol[:bshape[0], :bshape[1], :bshape[2]]] * 6))
    batch.block_until_ready()
    from magellanmapper_tpu.cv import detector
    sf = detector.calc_scaling_factor(res)[2]
    sigmas = tuple(detector.sigma_list(
        prof["min_sigma_factor"] * sf, prof["max_sigma_factor"] * sf,
        prof["num_sigma"]))
    sample = vol[::max(1, shape[0] // 16)]
    near_max = float(np.percentile(sample, 99.5))
    prep = (
        ("clip_vmin", float(prof["clip_vmin"])),
        ("clip_vmax", float(prof["clip_vmax"])),
        ("max_thresh", float(near_max * prof["max_thresh_factor"])),
        ("clip_min", float(prof["clip_min"])),
        ("clip_max", float(prof["clip_max"])),
        ("tot_var_denoise", float(prof["tot_var_denoise"] or 0.0)),
        ("unsharp_strength", float(prof["unsharp_strength"] or 0.0)),
        ("erosion_threshold", float(prof["erosion_threshold"] or 0.0)),
    )
    args = (sigmas, float(prof["detection_threshold"]),
            float(prof["overlap"]), 8192,
            tuple(int(v) for v in blocks.denoise_max_shape), prep)
    def timed_rate(a, b=batch, queue=6, reps=3):
        """Steady-state rate with ``queue`` dispatches in flight, one
        host pull at the end — exactly how ``detect_blobs_blocks``
        drives the device (batches stream through the two-deep pipeline
        without per-batch syncs). A per-batch pull would charge the
        tunnel's ~33 ms fixed RTT to every 150 ms batch (~20% of the
        figure); queued dispatches amortize it the way production does.
        Best of ``reps`` (the shared tunnel adds run-to-run noise)."""
        np.asarray(stack_detect._detect_batch_fused(b, *a)[1])
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [stack_detect._detect_batch_fused(b, *a)[1]
                    for _ in range(queue)]
            np.asarray(outs[-1])
            np.asarray(outs[0])
            dt = (time.perf_counter() - t0) / queue
            best = dt if best is None else min(best, dt)
        return b.size / best / 1e6

    dev = timed_rate(args)
    # detection-only device rate (no preproc): the configuration
    # comparable to the single-volume headline bench
    dev_nopre = timed_rate(args[:5] + (None,))

    # candidate-density sweep (round-3 VERDICT item 3): the harvest /
    # sparse-selection stages do data-dependent work, so the device rate
    # depends on how many voxels pass the detection threshold. Sweep
    # ~0.1x/1x/10x the production bench's blob density with the SAME
    # compiled program to bound the cliff.
    density_sweep = {}
    base_per_block = int(
        n_blobs * np.prod(bshape) / float(np.prod(shape)))
    zz13, yy13, xx13 = np.indices((13, 13, 13)).astype(np.float32) - 6
    for mult, tag in ((0.1, "0.1x"), (1.0, "1x"), (10.0, "10x")):
        nb = max(1, int(base_per_block * mult))
        dv = (rng.random(tuple(int(v) for v in bshape))
              * 800).astype(np.float32)
        dcoords = np.column_stack(
            [rng.integers(7, s - 7, nb) for s in bshape])
        for (cz, cy, cx), r in zip(dcoords, rng.uniform(3, 5.5, nb)):
            sig = r / np.sqrt(3)
            dv[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += np.exp(
                -(zz13**2 + yy13**2 + xx13**2) / (2 * sig**2)) * 40000
        db = jnp.asarray(np.stack([dv.astype(np.uint16)] * 6))
        db.block_until_ready()
        density_sweep[tag] = {
            "blobs_per_block": nb,
            "mvox_s": round(timed_rate(args, b=db, reps=2), 1),
            "mvox_s_nopreproc": round(
                timed_rate(args[:5] + (None,), b=db, reps=2), 1)}
        del db

    n = 0 if blobs is None else len(blobs)
    os.unlink(path)
    return e2e, dev, dev_nopre, n, e2e_split, density_sweep


def bench_registration_dsc(shape=(160, 240, 200)):
    """The TRUE Elastix-default schedule on an atlas-scale pair.

    translation 2048 / affine 1024 / bspline 512 iterations, 4
    resolutions, B-spline grid 50 voxels — the reference's default
    effort (``/root/reference/magmap/settings/atlas_prof.py:56,61,67``;
    Elastix runs ``MaximumNumberOfIterations`` at EVERY resolution).
    Runs the constant-shape smoothing pyramid (one compiled program per
    stage; Elastix ``FixedSmoothingImagePyramid`` semantics). Returns
    ``(wall_s, dsc)`` — the DSC gate the reference computes per run
    (``register.py:1001-1016``).
    """
    import jax.numpy as jnp
    from magellanmapper_tpu.atlas import reg_engine, transform
    from magellanmapper_tpu.settings.atlas_prof import (
        AtlasProfile, make_reg_param_map)

    rng = np.random.default_rng(3)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    fixed = np.zeros(shape, np.float32)
    for cz, cy, cx in np.column_stack(
            [rng.uniform(10, s - 10, 160) for s in shape]):
        fixed += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / 40.0)
    fixed /= fixed.max()
    true_aff = {"W": jnp.asarray(np.diag([0.08, -0.05, 0.06])),
                "t": jnp.asarray([3.0, -2.0, 2.0])}
    moving = np.asarray(transform.resample(
        jnp.asarray(fixed), true_aff, "affine", shape))

    prof = AtlasProfile()
    prof["reg_translation"] = make_reg_param_map(
        "translation", 2048, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_affine"] = make_reg_param_map(
        "affine", 1024, num_resolutions=4, pyramid_mode="smoothing")
    prof["reg_bspline"] = make_reg_param_map(
        "bspline", 512, grid_space_voxels=50, num_resolutions=4,
        pyramid_mode="smoothing")
    t0 = time.perf_counter()
    moved, result = reg_engine.register_duo(fixed, moving, prof)
    wall = time.perf_counter() - t0
    return wall, float(result.metrics["dsc_fixed_moved"])


def bench_reg_gauntlet(shape=(160, 240, 200)):
    """Realistic registration gauntlet (round-3 VERDICT item 1).

    Atlas-scale pair with a smooth FFD deformation ON TOP of an affine,
    a nonlinear intensity remap + bias field + noise on the fixed image
    (the atlas<->specimen modality gap Mattes-MI exists for,
    ``/root/reference/magmap/atlas/register.py:647,884-893``), and a
    multi-label annotation carried through the GT warp. Gates: overlap
    DSC >= 0.95, median label-transfer DSC >= 0.90, and the B-spline
    stage improving DSC by >= 0.05 over the affine stage.
    """
    from magellanmapper_tpu.atlas import gauntlet

    cache = os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".bench_cache")
    pair = gauntlet.build_pair(shape=shape, cache_dir=cache)
    t0 = time.perf_counter()
    result = gauntlet.run_gauntlet(pair)
    wall = time.perf_counter() - t0
    return {
        "wall_s": round(wall, 1),
        "dsc": round(result["dsc"], 4),
        "label_dsc_median": round(result["label_dsc_median"], 4),
        "label_dsc_min": round(result["label_dsc_min"], 4),
        "bspline_dsc_gain": round(result["bspline_dsc_gain"], 4),
        "warp_err_vox": round(result["warp_err_vox"], 2),
        "gt_disp_vox": round(result["gt_disp_vox"], 2),
        "passes": bool(result["passes"]),
    }


def bench_groupwise(shape=(160, 240, 200), k=4):
    """Atlas-scale joint groupwise registration (round-3 VERDICT item 7).

    ``k`` synthetic subjects — one shared anatomy, each carried through
    its own smooth FFD + affine ground-truth deformation with per-
    subject intensity jitter — register jointly under the 4D variance
    metric with the reference's ``groupwise`` profile settings (B-spline
    grid 130 vx, ``atlas_prof.py:287``). Reports wall-clock and the mean
    pairwise Otsu-overlap DSC across subjects before/after.
    """
    import itertools

    from magellanmapper_tpu.atlas import gauntlet, metrics, register
    from magellanmapper_tpu.settings.atlas_prof import AtlasProfile

    cache = os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    cache_path = os.path.join(
        cache, "groupwise_%s_k%d.npz" % (
            "_".join(str(int(s)) for s in shape), k))
    if os.path.exists(cache_path):
        subjects = list(np.load(cache_path)["subjects"])
    else:
        import jax
        import jax.numpy as jnp
        from magellanmapper_tpu.atlas import transform
        template, _ = gauntlet.make_anatomy(shape, seed=7)
        rng = np.random.default_rng(7)
        subjects = []
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            for i in range(k):
                gt = gauntlet.make_ground_truth(
                    shape, seed=20 + i, ffd_ctrl_sigma=13.0,
                    rot_deg=float(rng.uniform(-4, 4)),
                    shift=rng.uniform(-5, 5, 3))
                warped = np.asarray(transform.resample(
                    jnp.asarray(template), {"grid": gt["grid"]},
                    "bspline", shape, gt["spacing"],
                    pre_affine=gt["affine"], order=1))
                # per-subject brightness/gamma jitter (specimen-to-
                # specimen intensity variation)
                g = float(rng.uniform(0.85, 1.2))
                subjects.append(np.clip(warped, 0, None) ** g
                                * float(rng.uniform(0.8, 1.2)))
        np.savez(cache_path, subjects=np.stack(subjects))

    prof = AtlasProfile()
    prof.add_profiles("groupwise")
    t0 = time.perf_counter()
    mean_img, results = register.register_group(subjects, prof)
    wall = time.perf_counter() - t0

    def pairwise_dsc(vols):
        vals = [metrics.measure_overlap(a, b)
                for a, b in itertools.combinations(vols, 2)]
        return float(np.mean(vals))

    # moved subjects: apply each recovered transform
    from magellanmapper_tpu.atlas import transform as tf
    import jax.numpy as jnp
    moved = []
    for sub, p in zip(subjects, results):
        kind = "bspline" if "grid" in p else "affine"
        extra = {}
        if kind == "bspline":
            extra = {"spacing": p["spacing"],
                     "pre_affine": {"W": jnp.asarray(p["W"]),
                                    "t": jnp.asarray(p["t"])}}
            params = {"grid": jnp.asarray(p["grid"])}
        else:
            params = {"W": jnp.asarray(p["W"]), "t": jnp.asarray(p["t"])}
        moved.append(np.asarray(tf.resample(
            jnp.asarray(sub), params, kind, sub.shape, **extra)))
    return {
        "wall_s": round(wall, 1), "k": k, "shape": list(shape),
        "pairwise_dsc_before": round(pairwise_dsc(subjects), 4),
        "pairwise_dsc_after": round(pairwise_dsc(moved), 4),
        "grid_space_voxels": 130}


def bench_registration(shape=(64, 96, 96), iters=192):
    """Registration optimizer steps/sec (BASELINE.json second metric):
    affine stage with the Mattes-MI metric, single level, steady state."""
    import jax
    import jax.numpy as jnp
    from magellanmapper_tpu.atlas import reg_engine, transform

    rng = np.random.default_rng(0)
    zz, yy, xx = np.indices(shape).astype(np.float32)
    fixed = np.exp(-(((zz - shape[0]/2) / (shape[0]/3)) ** 2
                     + ((yy - shape[1]/2) / (shape[1]/3)) ** 2
                     + ((xx - shape[2]/2) / (shape[2]/3)) ** 2) * 2)
    fixed += 0.2 * np.sin(zz / 5) * np.sin(yy / 6)
    fixed = np.clip(fixed, 0, None).astype(np.float32)
    moving = np.asarray(transform.resample(
        jnp.asarray(fixed), {"t": jnp.asarray([-2.0, 3.0, -1.0])},
        "translation", shape))
    params = transform.identity_params("affine")
    lrs = (("W", 0.01), ("t", 1.0))
    # same metric-sample stride the engine itself would pick at this level
    stride = reg_engine._metric_stride(shape)
    # warmup/compile with the SAME static iteration count
    p0, l0 = reg_engine._optimize_level(
        jnp.asarray(fixed), jnp.asarray(moving), params, None, "affine",
        "AdvancedMattesMutualInformation", iters, None, lrs, stride)
    float(np.asarray(l0))
    t0 = time.perf_counter()
    p, loss = reg_engine._optimize_level(
        jnp.asarray(fixed), jnp.asarray(moving), params, None, "affine",
        "AdvancedMattesMutualInformation", iters, None, lrs, stride)
    float(np.asarray(loss))  # force sync
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    _enable_compile_cache()
    shape = (128, 256, 256)
    sigmas = np.linspace(2.0, 4.0, 8)
    threshold, overlap, capacity = 0.1, 0.5, 8192

    t_start = time.perf_counter()
    #: soft deadline: always print the JSON line well before any driver
    #: timeout; optional sections degrade to null past it
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", 900))

    def time_left():
        return deadline_s - (time.perf_counter() - t_start)

    def log(msg):
        print(f"[bench +{time.perf_counter() - t_start:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    # progressively-filled results + a watchdog: a hung device pull (the
    # remote tunnel has outage windows where even trivial ops block
    # forever) must still produce the one JSON line with whatever
    # completed, not silence
    r = {"tpu_mvox": None, "n_blobs": None, "cpu_mvox": None,
         "dev_bw": None, "dev_tf": None, "reg_ips": None,
         "blk_e2e": None, "blk_dev": None, "blk_dev_np": None,
         "blk_blobs": None, "blk_split": None, "blk_density": None,
         "reg_wall": None, "reg_dsc": None, "gauntlet": None,
         "groupwise": None}
    emitted = threading.Event()

    def emit():
        if emitted.is_set():
            return
        emitted.set()
        tpu_mvox = r["tpu_mvox"]
        cpu_mvox = r["cpu_mvox"]
        vsb = (round(tpu_mvox / cpu_mvox, 2)
               if tpu_mvox and cpu_mvox else None)
        print(json.dumps({
            "metric": "blob_detection_throughput",
            "value": round(tpu_mvox, 2) if tpu_mvox else None,
            "unit": "Mvox/s",
            "vs_baseline": vsb,
            "extra": _extra(r, shape, sigmas)}), flush=True)

    def watchdog():
        # hard stop well past the soft deadline: emit and exit
        time.sleep(deadline_s + 240)
        if not emitted.is_set():
            log("WATCHDOG: device appears hung; emitting partial result")
            emit()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    try:
        log("device capability probe")
        r["dev_bw"], r["dev_tf"] = bench_device_capability()
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    # if the TPU backend failed to initialize, JAX silently falls back
    # to the single CPU core — recording CPU throughput as the TPU
    # metric would be worse than recording nothing. Emit immediately.
    try:
        import jax
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        log("TPU backend unavailable (CPU fallback detected); "
            "emitting nulls rather than CPU-as-TPU numbers")
        emit()
        return
    vol = make_volume(shape)
    try:
        log("headline detection")
        r["tpu_mvox"], r["n_blobs"] = bench_tpu(
            vol, sigmas, threshold, overlap, capacity)
        log("cpu baseline")
        r["cpu_mvox"] = bench_cpu_baseline(vol, sigmas, threshold, overlap)
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    try:
        log("registration iters/s")
        r["reg_ips"] = round(bench_registration(), 1)
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    # block path first: the production-path record takes priority over
    # the DSC extra when the tunnel eats the time budget
    try:
        # warm block-path cost is ~1-2 min (compiles cached from the e2e
        # run's own warmup); run it whenever any budget remains
        if time_left() > 60:
            log("block path + density sweep")
            (blk_e2e, blk_dev, blk_dev_np, r["blk_blobs"],
             r["blk_split"], r["blk_density"]) = bench_block_path()
            r["blk_e2e"], r["blk_dev"], r["blk_dev_np"] = (
                round(blk_e2e, 2), round(blk_dev, 2), round(blk_dev_np, 2))
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    try:
        if time_left() > 180:
            log("registration full schedule")
            reg_wall, reg_dsc = bench_registration_dsc()
            r["reg_wall"], r["reg_dsc"] = (
                round(reg_wall, 2), round(reg_dsc, 4))
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    try:
        # realistic deformable + cross-modality validation (compiles
        # cached alongside the full-schedule bench shapes)
        if time_left() > 240:
            log("registration gauntlet")
            r["gauntlet"] = bench_reg_gauntlet()
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    try:
        # atlas-scale joint groupwise (4 subjects, grid 130 + schedule)
        if time_left() > 180:
            log("groupwise")
            r["groupwise"] = bench_groupwise()
    except Exception as exc:
        log(f"phase failed: {type(exc).__name__}: {exc}")
    log("done")
    emit()


def _extra(r, shape, sigmas):
    return {
            "volume": list(shape), "num_sigma": len(sigmas),
            "blobs": r["n_blobs"],
            "cpu_baseline_mvox_s": (
                round(r["cpu_mvox"], 3) if r["cpu_mvox"] else None),
            "block_path_e2e_mvox_s": r["blk_e2e"],
            "block_path_device_mvox_s": r["blk_dev"],
            "block_path_device_nopreproc_mvox_s": r["blk_dev_np"],
            "block_path_note": (
                "e2e on (128,512,512) uint16 memmap: the volume stages "
                "to HBM once (resident path) and blocks are carved "
                "on-device, so the ~50-100 MB/s dev-tunnel link is "
                "crossed by each voxel exactly once; device rates = "
                "same program on pre-staged blocks (10 sigmas, "
                "with/without saturate+denoise preproc; the headline "
                "runs 8 sigmas, no preproc). Preproc ON can beat OFF: "
                "harvest/selection cost scales with threshold-crossing "
                "candidates, and denoise zeroes background noise "
                "candidates — see density_sweep, where no-preproc wins "
                "only at 10x blob density (few noise candidates "
                "relative to real peaks)"),
            "block_path_blobs": r["blk_blobs"],
            "block_path_e2e_split": r["blk_split"],
            "density_sweep": r["blk_density"],
            "density_sweep_note": (
                "device Mvox/s on 6-block batches at 0.1x/1x/10x the "
                "1x-bench blob density (uniform noise background in "
                "all cases) — bounds the harvest path's "
                "candidate-density dependence"),
            "device_read_bw_gbps": r["dev_bw"],
            "device_gemm_tflops": r["dev_tf"],
            "device_note": (
                "measured ceilings of this axon v5e slice (datasheet "
                "v5e: 819 GB/s, 197 bf16 TFLOP/s) — workload numbers "
                "above run against THESE, not datasheet, ceilings"),
            "registration_iters_per_s": r["reg_ips"],
            "registration_bench": "affine stage, Mattes-MI, (64,96,96)",
            "registration_full_schedule_s": r["reg_wall"],
            "registration_full_schedule_dsc": r["reg_dsc"],
            "registration_full_schedule": (
                "TRUE Elastix defaults: translation 2048 / affine 1024 / "
                "bspline 512 iters x 4 resolutions (full max_iter per "
                "level), grid 50 vx, Mattes-MI, (160,240,200) pair, "
                "constant-shape smoothing pyramid"),
            "reg_gauntlet": r["gauntlet"],
            "reg_gauntlet_note": (
                "deformable + cross-modality validation pair "
                "(160,240,200): smooth FFD (affine component removed) "
                "on top of an affine, gamma+bias+noise modality gap, "
                "24-region annotation; gates dsc>=0.95, label-transfer "
                "median>=0.90, bspline stage gain>=0.05"),
            "groupwise": r["groupwise"],
            "groupwise_note": (
                "joint 4D-variance groupwise, 4 atlas-scale subjects, "
                "B-spline grid 130 vx + the reference groupwise "
                "profile's grid-spacing schedule")}


if __name__ == "__main__":
    main()
