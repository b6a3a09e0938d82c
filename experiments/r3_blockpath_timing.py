import sys, time, os
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from magellanmapper_tpu.cv import stack_detect
from magellanmapper_tpu.settings.roi_prof import ROIProfile

shape = (128, 512, 512)
rng = np.random.default_rng(1)
vol = (rng.random(shape) * 800).astype(np.uint16)
coords = np.column_stack([rng.integers(7, s - 7, 1500) for s in shape])
zz, yy, xx = np.indices((13, 13, 13)).astype(np.float32) - 6
for (cz, cy, cx), r in zip(coords, rng.uniform(3, 5.5, 1500)):
    sig = r / np.sqrt(3)
    vol[cz-6:cz+7, cy-6:cy+7, cx-6:cx+7] += (
        np.exp(-(zz**2+yy**2+xx**2)/(2*sig**2)) * 40000).astype(np.uint16)

prof = ROIProfile()
res = (1.0, 1.0, 1.0)
blocks = stack_detect.setup_blocks(prof, shape, res)
bshape = np.minimum(blocks.max_pixels + blocks.overlap, shape)
batch = jnp.asarray(np.stack([vol[:bshape[0], :bshape[1], :bshape[2]]] * 6))
batch.block_until_ready()
from magellanmapper_tpu.cv import detector
sf = detector.calc_scaling_factor(res)[2]
sigmas = tuple(detector.sigma_list(
    prof["min_sigma_factor"] * sf, prof["max_sigma_factor"] * sf, prof["num_sigma"]))
near_max = float(np.percentile(vol[::8], 99.5))
prep = (
    ("clip_vmin", float(prof["clip_vmin"])), ("clip_vmax", float(prof["clip_vmax"])),
    ("max_thresh", float(near_max * prof["max_thresh_factor"])),
    ("clip_min", float(prof["clip_min"])), ("clip_max", float(prof["clip_max"])),
    ("tot_var_denoise", 0.0), ("unsharp_strength", float(prof["unsharp_strength"] or 0.0)),
    ("erosion_threshold", float(prof["erosion_threshold"] or 0.0)))
args = (sigmas, float(prof["detection_threshold"]), float(prof["overlap"]), 8192,
        tuple(int(v) for v in blocks.denoise_max_shape), prep)
print("block", tuple(bshape), "sigmas", len(sigmas), flush=True)
for name, a in [("with preproc", args), ("no preproc", args[:5] + (None,))]:
    t0=time.perf_counter()
    raw, valid = stack_detect._detect_batch_fused(batch, *a); np.asarray(valid)
    print(f"{name}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    raw, valid = stack_detect._detect_batch_fused(batch, *a); nb=int(np.asarray(valid).sum())
    dt = time.perf_counter()-t0
    print(f"{name}: {batch.size/dt/1e6:.1f} Mvox/s ({dt*1e3:.0f} ms, {nb} blobs)", flush=True)
