"""Probe #13: final primitive checks for the VMEM-resident active-volume design.
(a) in-kernel dynamic slice from a VMEM ref with arbitrary scalar starts
(b) SMEM blockspec input for per-tile int32 scalars
(c) dynamic VMEM stores (in-place row updates, bulk flush)
(d) 16MB int8 VMEM-resident input, per-step scalar-indexed row slices
"""
import time, sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo/tools")
from tim import bench_threaded
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
key = jax.random.PRNGKey(0)

# ---------- (a)+(b)+(d): raycast-like kernel ----------
# vol int8 [NB,512] resident; per-tile 64 page ids (SMEM); fetch pages via
# in-kernel ds, one-hot matmul reduce -> per-tile output row.
NB, S3, NT, KP = 8192, 512, 1200, 48
vol8 = jax.random.randint(key, (NB, S3), -100, 100, dtype=jnp.int8)
pids = jax.random.randint(key, (NT, 1, 64), 0, NB, dtype=jnp.int32)

def rk(pid_ref, vol_ref, out_ref, pages_scr):
    # fetch 48 pages by scalar index from the VMEM-resident volume
    def get(k, _):
        p = pid_ref[0, 0, k]
        pages_scr[pl.ds(k, 1), :] = vol_ref[pl.ds(p, 1), :].astype(jnp.float32)
        return 0
    jax.lax.fori_loop(0, KP, get, 0, unroll=True)
    # fake march: one-hot over 512 voxels, Q = OHv @ pages^T -> [128, KP]
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (128, S3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (128, S3), 1)
    vsel = (rows * 17 + i) % S3
    ohv = (cols == vsel).astype(jnp.float32)           # [128, 512]
    q = jax.lax.dot_general(ohv, pages_scr[:],          # [128,512]@[48,512]^T
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [128, KP]
    out_ref[0] = jnp.sum(q, axis=1, keepdims=True).T * 1e-6  # [1,128]

def rc(vol8, pids):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, 64), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((NB, S3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((KP, S3), jnp.float32)],
    )
    return pl.pallas_call(
        rk, out_shape=jax.ShapeDtypeStruct((NT, 1, 128), jnp.float32), grid_spec=gs,
    )(pids, vol8)

try:
    f = jax.jit(lambda v, p: (rc(v, p), p))
    @jax.jit
    def step(st):
        v, p = st
        o, _ = f(v, p)
        return (v, (p + o[:, :, :64].astype(jnp.int32)*0 + 1) % NB)
    sec = bench_threaded(step, (vol8, pids), n=4)
    print(f"raycast-skeleton {NT} tiles x {KP} pages: {sec*1000:.2f} ms ({sec/NT*1e6:.2f} us/tile)", flush=True)
except Exception as e:
    print("RAYCAST-SKEL FAIL:", str(e)[:800], flush=True)

# ---------- (a2): arbitrary 2-D dynamic slice window from VMEM image ----------
H2, W2 = 512, 768
img = jax.random.normal(key, (H2, W2), jnp.float32)
starts = jax.random.randint(key, (NT, 1, 64), 0, 400, dtype=jnp.int32)
def wk(st_ref, img_ref, out_ref):
    a = st_ref[0, 0, 0]
    b = st_ref[0, 0, 1]
    win = img_ref[pl.ds(a, 64), pl.ds(b, 64)]
    out_ref[0] = jnp.sum(win, axis=0, keepdims=True)[:, :128] if False else jnp.pad(jnp.sum(win, axis=0, keepdims=True), ((0,0),(0,64)))
def wc(img, starts):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, 64), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((H2, W2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(wk, out_shape=jax.ShapeDtypeStruct((NT, 1, 128), jnp.float32), grid_spec=gs)(starts, img)
try:
    @jax.jit
    def step2(st):
        im, s = st
        o = wc(im, s)
        return (im, (s + o[:, :, :64].astype(jnp.int32)*0 + 3) % 400)
    sec = bench_threaded(step2, (img, starts), n=4)
    print(f"dyn-window-slice {NT} tiles: {sec*1000:.2f} ms ({sec/NT*1e6:.2f} us/tile)", flush=True)
except Exception as e:
    print("DYN-WIN FAIL:", str(e)[:800], flush=True)

# ---------- (c): dynamic VMEM stores, full-array in/out, in-place ----------
NVv = 4096
rows8 = jax.random.randint(key, (NVv,), 0, NB, dtype=jnp.int32).astype(jnp.int32)
def sk(r_ref, vol_ref, out_ref):
    # one grid step: update 4096 rows in place via ds stores
    def body(k, _):
        p = r_ref[k]
        out_ref[pl.ds(p, 1), :] = (vol_ref[pl.ds(p, 1), :].astype(jnp.int32) + 1).astype(jnp.int8)
        return 0
    jax.lax.fori_loop(0, NVv, body, 0)
def sc(vol8, rows):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((NB, S3), lambda i, r: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NB, S3), lambda i, r: (0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(sk, out_shape=jax.ShapeDtypeStruct((NB, S3), jnp.int8),
                          grid_spec=gs, input_output_aliases={1: 0})(rows, vol8)
try:
    @jax.jit
    def step3(st):
        v, r = st
        return (sc(v, r), (r + 1) % NB)
    sec = bench_threaded(step3, (vol8, rows8), n=4)
    print(f"inplace dyn-stores {NVv} rows: {sec*1000:.2f} ms ({sec/NVv*1e6:.2f} us/row)", flush=True)
except Exception as e:
    print("DYN-STORE FAIL:", str(e)[:800], flush=True)
