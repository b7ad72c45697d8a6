"""Bisect allocate_scene_from_depth cost (dev tool)."""
import time, jax, jax.numpy as jnp
from infinitam_tpu.calib import default_calib
from infinitam_tpu.config import SceneParams, Settings, TrackingParams, VoxelBlockHashParams
from infinitam_tpu.engine import hash_pipeline as hp
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.engine.view_builder import View
from infinitam_tpu.io import synth
from infinitam_tpu.ops import hashing
from infinitam_tpu.utils import se3

def t(name, fn, *args, n=5):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")

img = (480, 640)
settings = Settings(scene=SceneParams(voxel_size=0.01, mu=0.04, view_frustum_min=0.35, view_frustum_max=3.0),
                    hashing=VoxelBlockHashParams(), tracking=TrackingParams())
calib = default_calib(img[1], img[0])
proj = jnp.asarray(calib.intrinsics_d.vector)
src = synth.SyntheticSource(calib, n_frames=4, img_size=img)
depth, _rgb, _gt = src.get_images()
vol, rs, state = hp.create_engine_state(settings, img)
for _ in range(2):
    vol, rs, state, diag = hp.process_frame_hash(vol, rs, state, View(depth=depth), proj, settings)
jax.block_until_ready(state.pose)
pose = state.pose
sp, hpar = settings.scene, settings.hashing
s = settings.alloc_subsample
depth_a = depth[::s, ::s]; proj_a = proj / s

def cands(d):
    return hashing.blocks_on_ray_segment(d, proj_a, se3.invert(pose), sp.mu, sp.voxel_size,
                                         hpar.block_size, hp.MAX_BAND_STEPS,
                                         sp.view_frustum_min, sp.view_frustum_max)
t("blocks_on_ray_segment", lambda d: cands(d)[0].sum(), depth_a)
blocks, valid = jax.jit(cands)(depth_a)
cand = blocks.reshape(-1, 3); cand_valid = valid.reshape(-1)
vt = hv.set_previous_visible(rs)
t("set_previous_visible", lambda r: hv.set_previous_visible(r), rs)
t("pack_entries", lambda v: hv.pack_entries(v), vol)
packed = jax.jit(hv.pack_entries)(vol)
t("probe 460k cands", lambda c, cv: hv.probe(vol, c, hpar, packed=packed).found.sum(), cand, cand_valid)
t("plan_allocations", lambda c, cv: hv.plan_allocations(vol, vt, c, cv, hpar).alloc_type.sum(), cand, cand_valid)
plan = jax.jit(lambda c, cv: hv.plan_allocations(vol, vt, c, cv, hpar))(cand, cand_valid)
t("execute_allocations", lambda p: hv.execute_allocations(vol, p, hpar)[0].last_free_block, plan)
t("build_visible_list", lambda v: hv.build_visible_list(v, vt, pose, proj, img, sp.voxel_size, hpar).visible_ids, vol)
t("FULL allocate_scene_from_depth",
  lambda v, r: hp.allocate_scene_from_depth(v, r, depth, pose, proj, settings)[1].visible_ids, vol, rs)
