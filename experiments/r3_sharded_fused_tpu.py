import sys, time
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, "/root/repo")
from magellanmapper_tpu.parallel import halo, mesh as mesh_mod
from magellanmapper_tpu.cv import detector, ref_detect
from magellanmapper_tpu.settings.roi_prof import ROIProfile
import jax.numpy as jnp

rng = np.random.default_rng(0)
shape = (64, 128, 256)
vol = rng.normal(0.02, 0.01, shape).astype(np.float32)
zz, yy, xx = np.indices(shape).astype(np.float32)
centers = np.column_stack([rng.uniform(8, s - 8, 80) for s in shape])
for cz, cy, cx in centers:
    sig = 4.0 / np.sqrt(3)
    vol += np.exp(-((zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2) / (2*sig**2))
vol = np.clip(vol / vol.max(), 0, None)

prof = ROIProfile()
prof["min_sigma_factor"] = 2.0
prof["max_sigma_factor"] = 4.0
prof["num_sigma"] = 6
prof["denoise_size"] = 16
prof["max_blobs_per_block"] = 2048

m = mesh_mod.make_mesh(1, dp=1, sp=1)   # 1-device REAL-TPU mesh:
# exercises Pallas fused peaks + fused tile preproc INSIDE shard_map
t0 = time.time()
sharded = halo.detect_blobs_sharded(
    vol, prof, (1.0, 1.0, 1.0), mesh=m, preprocess=True,
    near_max=float(np.percentile(vol[::4], 99.5)))
print(f"sharded (1-dev TPU mesh, Pallas in shard_map): "
      f"{0 if sharded is None else len(sharded)} blobs "
      f"({time.time()-t0:.0f}s incl compile)", flush=True)

# single-shot comparator (same preproc + detection, no shard_map)
from magellanmapper_tpu.cv.stack_detect import _preproc_one
prep = (
    ("clip_vmin", float(prof["clip_vmin"])),
    ("clip_vmax", float(prof["clip_vmax"])),
    ("max_thresh", float(np.percentile(vol[::4], 99.5)
                         * prof["max_thresh_factor"])),
    ("clip_min", float(prof["clip_min"])),
    ("clip_max", float(prof["clip_max"])),
    ("tot_var_denoise", 0.0),
    ("unsharp_strength", float(prof["unsharp_strength"])),
    ("erosion_threshold", float(prof["erosion_threshold"])))
pre = _preproc_one(jnp.asarray(vol), (16, 16, 16), prep,
                   fused_tiles=True)
sigmas = tuple(detector.sigma_list(2.0, 4.0, 6))
raw, valid = detector.blob_log(
    jnp.asarray(pre), sigmas, prof["detection_threshold"],
    prof["overlap"], 2048)
raw = np.asarray(raw)[np.asarray(valid)]
raw[:, 3] *= np.sqrt(3)
print(f"single-shot: {len(raw)} blobs", flush=True)
n_match = ref_detect.match_blob_sets(sharded[:, :3], raw[:, :3], (2, 2, 2))
frac = n_match / max(len(sharded), len(raw))
print(f"hungarian match: {n_match} ({frac:.3f})", flush=True)
assert frac >= 0.99, frac
print("PASS", flush=True)
