"""Probe #7b: keystone Pallas pattern — scalar-prefetch row DMA + one-hot MXU taps.

Checks (on real TPU):
  1. dynamic index_map on BOTH input and output, aliased in/out (in-place VBA row
     update), with [B, 8, 64] row layout;
  2. numerical correctness vs an XLA oracle (partial writes must not clobber
     untouched rows);
  3. throughput at NV=6144 blocks incl. a [512,128]x[128,128] one-hot matmul per
     block;
  4. cost of the [B,512] <-> [B,8,64] relayout reshape.
"""
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
S3 = 512
H, W = 480, 640
WIN = 128
NWV, NWU = H // WIN + 1, W // WIN + 1   # window grid (padded image)


def make(B, NV):
    ks = jax.random.split(key, 4)
    vba = jax.random.normal(ks[0], (B, S3), jnp.float32)
    depth = jax.random.normal(ks[1], (NWV * WIN, NWU * WIN), jnp.float32)
    ptrs = jax.random.permutation(ks[2], B)[:NV].astype(jnp.int32)
    wv = jax.random.randint(ks[3], (NV,), 0, NWV, dtype=jnp.int32)
    wu = jax.random.randint(ks[3], (NV,), 0, NWU, dtype=jnp.int32)
    valid = (jnp.arange(NV) % 7 != 3)  # some padding steps
    return vba, depth, ptrs, wv, wu, valid.astype(jnp.int32)


def kernel(ptr_ref, wv_ref, wu_ref, valid_ref, row_ref, win_ref, out_ref):
    i = pl.program_id(0)
    row = row_ref[0].reshape(1, S3)          # [1, 512]
    lin = jax.lax.broadcasted_iota(jnp.int32, (S3, WIN), 0)
    dvk = (lin[:, 0:1] * 3 + i) % WIN
    col = jax.lax.broadcasted_iota(jnp.int32, (S3, WIN), 1)
    oh_v = (col == dvk).astype(jnp.bfloat16)
    s1 = jnp.dot(oh_v, win_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    oh_u = (col == ((dvk * 7) % WIN)).astype(jnp.float32)
    tap = jnp.sum(s1 * oh_u, axis=1)         # [S3]
    newrow = row + tap[None, :] * 1e-3
    keep = valid_ref[i] > 0
    out = jnp.where(keep, newrow, row)
    out_ref[0] = out.reshape(8, 64)


def run(vba, depth, ptrs, wv, wu, valid):
    B = vba.shape[0]
    v3 = vba.reshape(B, 8, 64)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ptrs.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 8, 64), lambda i, p, v, u, q: (p[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, WIN), lambda i, p, v, u, q: (v[i], u[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 64), lambda i, p, v, u, q: (p[i], 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 8, 64), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},
    )(ptrs, wv, wu, valid, v3, depth)
    return out.reshape(B, S3)


def oracle(vba, depth, ptrs, wv, wu, valid):
    NV = ptrs.shape[0]
    i = jnp.arange(NV)
    lin = jnp.arange(S3)
    dvk = (lin[None, :, None] * 3 + i[:, None, None]) % WIN      # [NV, S3, 1]
    duk = (dvk * 7) % WIN
    vv = wv[:, None, None] * WIN + dvk
    uu = wu[:, None, None] * WIN + duk
    tap = depth[vv[..., 0], uu[..., 0]]                           # [NV, S3]
    tap = jnp.round(tap.astype(jnp.bfloat16).astype(jnp.float32), 10)
    rows = vba[ptrs]
    new = rows + tap * 1e-3
    new = jnp.where(valid[:, None] > 0, new, rows)
    return vba.at[ptrs].set(new)


# correctness on a small case
Bs, NVs = 512, 64
args_s = make(Bs, NVs)
try:
    got = jax.jit(run)(*args_s)
    want = jax.jit(oracle)(*args_s)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"correctness max err = {err:.2e}", flush=True)
except Exception as e:
    print("RUN FAIL:", str(e)[:1500], flush=True)
    raise SystemExit

# throughput
B, NV = 65536, 6144
args = make(B, NV)
f = jax.jit(run)
sec = timed(f, *args)
print(f"pallas mini-integrate {NV} blocks: {(sec-OVH)*1000:.2f} ms", flush=True)

# relayout cost
v = args[0]
g = jax.jit(lambda x: x.reshape(B, 8, 64) + 1.0)
sec = timed(g, v)
print(f"reshape+add [65536,512]->[B,8,64]: {(sec-OVH)*1000:.2f} ms", flush=True)
