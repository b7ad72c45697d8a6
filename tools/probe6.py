"""Probe #6: (a) Mosaic dynamic_gather support matrix, (b) honest XLA gather menu.

Timing: K-chained ops inside one jit, synced by a tiny host transfer; an empty
chain calibrates per-call overhead.
"""
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

K = 32

def timed(f, *args, n=3):
    o = f(*args); _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
    return (time.perf_counter()-t0)/n

# calibrate call overhead
@jax.jit
def empty(x):
    return x + 1.0
OVH = timed(empty, jnp.zeros((8, 128)))
print(f"per-call overhead ~ {OVH*1000:.2f} ms", flush=True)

def report(name, sec_per_call):
    ms = (sec_per_call - OVH)/K*1000
    print(f"{name:58s} {ms:9.4f} ms/op", flush=True)

key = jax.random.PRNGKey(0)

# ---- (a) Pallas dynamic_gather support matrix --------------------------------
def try_dg(R, C, dtype, axis, name):
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=axis)
    def call(tab, idx):
        def body(k, carry):
            t2, i2 = carry
            o = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R, C), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t2, i2)
            return t2, (i2 + o.astype(jnp.int32) + k) % (R if axis == 0 else C)
        return jax.lax.fori_loop(0, K, body, (tab, idx))[1]
    tab = jax.random.randint(key, (R, C), 0, min(R, 120), dtype=jnp.int32).astype(dtype)
    idx = jax.random.randint(key, (R, C), 0, R if axis == 0 else C, dtype=jnp.int32)
    try:
        f = jax.jit(call)
        sec = timed(f, tab, idx)
        report(f"dg {name} [{R},{C}] {np.dtype(dtype).name} axis{axis}", sec)
    except Exception as e:
        print(f"dg {name} [{R},{C}] {np.dtype(dtype).name} axis{axis}: FAIL {str(e)[:120]}", flush=True)

try_dg(8, 128, jnp.float32, 0, "tiny")
try_dg(8, 128, jnp.float32, 1, "tiny")
try_dg(64, 128, jnp.float32, 0, "med")
try_dg(512, 128, jnp.float32, 0, "big")
try_dg(512, 128, jnp.int8, 0, "big8")
try_dg(512, 512, jnp.float32, 0, "wide")
try_dg(1024, 128, jnp.float32, 0, "huge")
try_dg(8, 128, jnp.int8, 1, "tiny8")
try_dg(32, 128, jnp.bfloat16, 0, "bf16")

# ---- (b) honest XLA menu ----------------------------------------------------
def chain(fn, feedback):
    """fn: (state,) -> out; feedback: (state, out, k) -> state."""
    def call(*args):
        def body(k, st):
            return feedback(st, fn(st), k)
        return jax.lax.fori_loop(0, K, body, args)
    return jax.jit(call)

# flat element gather 307k from block-grid-sized and volume-sized tables
for T, N, nm in [(1<<18, 307200, "grid"), (1<<25, 307200, "vol33M"), (1<<25, 76800, "vol/4px"), (1<<25, 4800, "vol/64px")]:
    tab = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    f = chain(lambda st: jnp.take(st[0], st[1]), lambda st, o, k: (st[0], (st[1]+o+k) % T))
    report(f"XLA take {N//1000}k from {nm}", timed(f, tab, idx))

# int8 volume gather
tab8 = jax.random.randint(key, (1<<25,), 0, 100, dtype=jnp.int8)
idx = jax.random.randint(key, (307200,), 0, 1<<25, dtype=jnp.int32)
f = chain(lambda st: jnp.take(st[0], st[1]), lambda st, o, k: (st[0], (st[1]+o.astype(jnp.int32)*131+k) % (1<<25)))
report("XLA take 307k int8 from 33M", timed(f, tab8, idx))

# row gathers: [V,512] f32 and int8
V = 65536
for nR in [1024, 6144]:
    tabR = jax.random.randint(key, (V, 512), 0, V, dtype=jnp.int32)
    idxR = jax.random.randint(key, (nR,), 0, V, dtype=jnp.int32)
    f = chain(lambda st: jnp.take(st[0], st[1], axis=0),
              lambda st, o, k: (st[0], (st[1]+o[:, 0]+k) % V))
    report(f"XLA row-gather {nR}x512 i32 from [65536,512]", timed(f, tabR, idxR))

# row scatter
nR = 6144
idxR = jax.random.randint(key, (nR,), 0, V, dtype=jnp.int32)
valsR = jax.random.randint(key, (nR, 512), 0, V, dtype=jnp.int32)
def scat(st):
    tab, i = st
    return tab.at[i].set(valsR)
f = chain(scat, lambda st, o, k: (o, (st[1]+o[0, 0]+k) % V))
report("XLA row-scatter 6144x512 i32 into [65536,512]", timed(f, tabR, idxR))

# scatter-min 307k elements into 4800-el image (expected ranges)
timg = jnp.zeros((4800,), jnp.float32)
sidx = jax.random.randint(key, (307200,), 0, 4800, dtype=jnp.int32)
svals = jax.random.normal(key, (307200,))
def scat2(st):
    img, i = st
    return img.at[i].min(svals)
f = chain(scat2, lambda st, o, k: (o, (st[1]+o[:1].astype(jnp.int32)[0]+k) % 4800))
report("XLA scatter-min 307k into 4800", timed(f, timg, sidx))

# cumsum + nonzero over E=1.18M
E = 0x120000
mask = jax.random.randint(key, (E,), 0, 2, dtype=jnp.int32)
f = chain(lambda st: jnp.cumsum(st[0]), lambda st, o, k: ((st[0]+o[-1:]*0+k) % 2, ))
# simpler: just time cumsum via direct chain on mask
def cs(st):
    m, = st
    c = jnp.cumsum(m)
    return (m + c[-1] % 2,)
f = jax.jit(lambda m: jax.lax.fori_loop(0, K, lambda k, st: cs(st), (m,)))
report("XLA cumsum 1.18M", timed(f, mask))
