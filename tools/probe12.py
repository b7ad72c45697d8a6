"""Probe #12: re-derive load-bearing costs with state-threaded timing."""
import time, sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo/tools")
from tim import bench_threaded
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

key = jax.random.PRNGKey(0)
K = 8  # in-jit chain reps

def report(name, sec_per_call, unit_per_call=1.0, unit="op"):
    print(f"{name:58s} {sec_per_call*1000/unit_per_call:9.3f} ms/{unit}", flush=True)

# (0) dispatch overhead: empty threaded step
f0 = jax.jit(lambda x: x + 1.0)
report("dispatch (tiny add, threaded)", bench_threaded(f0, jnp.zeros((8,128))), 1)

# (a) XLA random gather 307k from tables of various sizes, K-chained
for logT, nm in [(18, "1MB"), (21, "8MB"), (25, "134MB")]:
    T = 1 << logT
    tab = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
    @jax.jit
    def step(st, tab=tab, T=T):
        idx, = st
        def body(k, i):
            return (i + jnp.take(tab, i) + k) % T
        return (jax.lax.fori_loop(0, K, body, idx),)
    idx0 = (jax.random.randint(key, (307200,), 0, T, dtype=jnp.int32),)
    sec = bench_threaded(step, idx0)
    report(f"XLA take 307k from {nm} (chain {K})", sec, K)

# (d) dense elementwise pass over 134MB f32
X = jax.random.normal(key, (65536, 512), jnp.float32)
@jax.jit
def dstep(st):
    x, = st
    def body(k, x):
        return x * 1.000001 + 1e-7
    return (jax.lax.fori_loop(0, K, body, x),)
report(f"dense rmw 134MB f32 (chain {K})", bench_threaded(dstep, (X,)), K)

# (c) XLA matmul peak, threaded chain
A = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
@jax.jit
def mstep(st):
    a, = st
    def body(k, a):
        return (jnp.dot(a, a, preferred_element_type=jnp.float32) * 1e-3).astype(jnp.bfloat16)
    return (jax.lax.fori_loop(0, K, body, a),)
sec = bench_threaded(mstep, (A,)) / K
print(f"XLA matmul 4096^3 bf16: {sec*1000:.2f} ms -> {2*4096**3/sec/1e12:.1f} TFLOP/s", flush=True)

# (b) Pallas per-step cost: grid(6144) tiny copy, threaded; block (8,512)
Y = jax.random.normal(key, (6144*8, 512), jnp.float32)
def ck(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.000001
def cp(x, gsteps, rows):
    return pl.pallas_call(
        ck,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(gsteps,),
            in_specs=[pl.BlockSpec((rows, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(x)
for gsteps, rows in [(6144, 8), (768, 64), (96, 512)]:
    @jax.jit
    def pstep(st, gsteps=gsteps, rows=rows):
        x, = st
        def body(k, x):
            return cp(x, gsteps, rows)
        return (jax.lax.fori_loop(0, 4, body, x),)
    sec = bench_threaded(pstep, (Y,)) / 4
    gb = Y.size*4*2/1e9
    print(f"pallas copy 196MB grid({gsteps})x({rows},512): {sec*1000:7.2f} ms -> {gb/sec:5.0f} GB/s, {sec/gsteps*1e6:7.2f} us/step", flush=True)

# (b2) pallas dynamic-row integrate-pattern per-step cost, threaded
S3, WIN = 512, 128
B, NV = 65536, 6144
depthT = jax.random.normal(key, (768, 512), jnp.float32)
ptrs = jax.random.permutation(key, B)[:NV].astype(jnp.int32)
wv = jax.random.randint(key, (NV,), 0, 4, dtype=jnp.int32)
wu = jax.random.randint(key, (NV,), 0, 6, dtype=jnp.int32)
def kern(p, v, u, row_ref, win_ref, out_ref):
    i = pl.program_id(0)
    vox = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 0)
    dv = (vox[0:1, :] * 3 + i) % WIN
    oh_v = (rid == dv).astype(jnp.float32)
    s1t = jnp.dot(win_ref[:], oh_v, preferred_element_type=jnp.float32)
    tap = jnp.sum(s1t * (rid == (dv * 7) % WIN), axis=0, keepdims=True)
    out_ref[0] = row_ref[0] + tap * 1e-9
def integ(vba):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NV,),
        in_specs=[
            pl.BlockSpec((1, 1, S3), lambda i, p, v, u: (p[i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN, WIN), lambda i, p, v, u: (u[i], v[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S3), lambda i, p, v, u: (p[i], 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, 1, S3), jnp.float32),
        grid_spec=gs,
    )(ptrs, wv, wu, vba, depthT)
@jax.jit
def istep(st):
    v, = st
    return (integ(v.reshape(B,1,S3)).reshape(B,S3),)
sec = bench_threaded(istep, (X,), n=4)
print(f"pallas dyn-row integrate {NV} blocks: {sec*1000:.2f} ms -> {sec/NV*1e6:.2f} us/step", flush=True)
