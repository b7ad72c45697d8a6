"""Probe #9: reshape-free integrate pattern ([B,1,512] rows, transposed one-hot)
+ scratch persistence across grid steps (raycast page accumulator)."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

def timed(f, *args, n=3):
    o = f(*args); _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    return (time.perf_counter()-t0)/n

@jax.jit
def empty(x):
    return x + 1.0
OVH = timed(empty, jnp.zeros((8, 128)))
print(f"overhead {OVH*1000:.2f} ms", flush=True)

key = jax.random.PRNGKey(0)
S3, WIN = 512, 128

def kernel(ptr_ref, wv_ref, wu_ref, valid_ref, row_ref, winT_ref, out_ref):
    i = pl.program_id(0)
    row = row_ref[0]                                     # (1, 512)
    vox = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 1)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 0)
    dv = (vox[0:1, :] * 3 + i) % WIN                     # (1, S3) per-voxel row tap
    du = (dv * 7) % WIN
    oh_v = (r_ids == dv).astype(jnp.float32)             # (WIN, S3)
    s1t = jnp.dot(winT_ref[:].astype(jnp.float32), oh_v,
                  preferred_element_type=jnp.float32)    # (WIN_c, S3)
    oh_u = (r_ids == du).astype(jnp.float32)
    tap = jnp.sum(s1t * oh_u, axis=0, keepdims=True)     # (1, S3)
    newrow = row + tap * 1e-3
    keep = valid_ref[i] > 0
    out_ref[0] = jnp.where(keep, newrow, row)

def run(vba, depthT, ptrs, wv, wu, valid):
    B = vba.shape[0]
    v3 = vba.reshape(B, 1, S3)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ptrs.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, S3), lambda i, p, v, u, q: (p[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, WIN), lambda i, p, v, u, q: (u[i], v[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S3), lambda i, p, v, u, q: (p[i], 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((B, 1, S3), jnp.float32),
        grid_spec=gs, input_output_aliases={4: 0},
    )(ptrs, wv, wu, valid, v3, depthT)
    return out.reshape(B, S3)

def oracle(vba, depthT, ptrs, wv, wu, valid):
    NV = ptrs.shape[0]
    i = jnp.arange(NV)
    lin = jnp.arange(S3)
    dv = (lin[None, :] * 3 + i[:, None]) % WIN
    du = (dv * 7) % WIN
    # depthT is [Wpad, Hpad] transposed; window (u[i], v[i]) block
    uu = wu[:, None] * WIN + du
    vv = wv[:, None] * WIN + dv
    tap = depthT[uu, vv]
    rows = vba[ptrs]
    new = jnp.where(valid[:, None] > 0, rows + tap * 1e-3, rows)
    return vba.at[ptrs].set(new)

def make(B, NV):
    ks = jax.random.split(key, 4)
    vba = jax.random.normal(ks[0], (B, S3), jnp.float32)
    depthT = jax.random.normal(ks[1], (768, 512), jnp.float32)  # [Wpad, Hpad]
    ptrs = jax.random.permutation(ks[2], B)[:NV].astype(jnp.int32)
    wv = jax.random.randint(ks[3], (NV,), 0, 4, dtype=jnp.int32)
    wu = jax.random.randint(ks[3], (NV,), 0, 6, dtype=jnp.int32)
    valid = (jnp.arange(NV) % 7 != 3).astype(jnp.int32)
    return vba, depthT, ptrs, wv, wu, valid

a = make(512, 64)
try:
    got = jax.jit(run)(*a)
    want = jax.jit(oracle)(*a)
    print(f"integrate-pattern max err = {float(jnp.max(jnp.abs(got-want))):.2e}", flush=True)
except Exception as e:
    print("FAIL:", str(e)[:600], flush=True)

a = make(65536, 6144)
f = jax.jit(run)
sec = timed(f, *a)
print(f"pallas integrate-pattern 6144 blocks: {(sec-OVH)*1000:.2f} ms", flush=True)

# ---- scratch persistence across grid steps (page accumulator) ---------------
K = 16
def kacc(ptr_ref, page_ref, out_ref, scr):
    t = pl.program_id(0)
    k = pl.program_id(1)
    scr[pl.ds(k, 1)] = page_ref[0]                   # accumulate page k
    @pl.when(k == K - 1)
    def _():
        out_ref[0] = jnp.sum(scr[:], axis=0, keepdims=True)[0][None]

def run_acc(pages, ptrs):
    NT = ptrs.shape[0] // K
    v3 = pages.reshape(pages.shape[0], 1, S3)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT, K),
        in_specs=[pl.BlockSpec((1, 1, S3), lambda t, k, p: (p[t * K + k], 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, S3), lambda t, k, p: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kacc, out_shape=jax.ShapeDtypeStruct((NT, 1, S3), jnp.float32),
        grid_spec=gs, scratch_shapes=[pltpu.VMEM((K, S3), jnp.float32)],
    )(ptrs, v3).reshape(NT, S3)

NP, NT = 4096, 600
pages = jax.random.normal(key, (NP, S3), jnp.float32)
pidx = jax.random.randint(key, (NT * K,), 0, NP, dtype=jnp.int32)
try:
    got = jax.jit(run_acc)(pages, pidx)
    want = pages[pidx].reshape(NT, K, S3).sum(axis=1)
    print(f"page-accumulator max err = {float(jnp.max(jnp.abs(got-want))):.2e}", flush=True)
    sec = timed(jax.jit(run_acc), pages, pidx)
    print(f"page-accumulator {NT}x{K} pages: {(sec-OVH)*1000:.2f} ms", flush=True)
except Exception as e:
    print("ACC FAIL:", str(e)[:600], flush=True)
