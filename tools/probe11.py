"""Probe #11: is Pallas native or emulated here? Big-block matmul + copy throughput."""
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

# Pallas tiled matmul 2048x2048x2048 bf16, 256-tiles
M = N = K = 2048
TM = TN = 256
A = jax.random.normal(key, (M, K), jnp.bfloat16)
Bm = jax.random.normal(key, (K, N), jnp.bfloat16)
def mk(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
def mm(a, b):
    return pl.pallas_call(
        mk,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(M//TM, N//TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(a, b)
try:
    sec = timed(jax.jit(mm), A, Bm) - OVH
    print(f"pallas matmul 2048^3 bf16 ({(M//TM)*(N//TN)} steps): {sec*1000:.2f} ms -> {2*M*N*K/sec/1e12:.1f} TFLOP/s", flush=True)
except Exception as e:
    print("MM FAIL:", str(e)[:300], flush=True)

# XLA same matmul
sec = timed(jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)), A, Bm) - OVH
print(f"XLA matmul 2048^3 bf16: {sec*1000:.2f} ms -> {2*M*N*K/sec/1e12:.1f} TFLOP/s", flush=True)

# Pallas big copy: 134MB in 64 steps of 2MB
X = jax.random.normal(key, (65536, 512), jnp.float32)
def ck(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.000001
def cp(x):
    return pl.pallas_call(
        ck,
        out_shape=jax.ShapeDtypeStruct(X.shape, jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(64,),
            in_specs=[pl.BlockSpec((65536//64, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((65536//64, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(x)
sec = timed(jax.jit(cp), X) - OVH
gb = X.size*4*2/1e9
print(f"pallas copy 134MB (64 steps): {sec*1000:.2f} ms -> {gb/sec:.0f} GB/s", flush=True)

# same with 6144 steps of tiny blocks (isolate per-step cost, static maps)
def cp2(x):
    return pl.pallas_call(
        ck,
        out_shape=jax.ShapeDtypeStruct((6144, 512), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(6144,),
            in_specs=[pl.BlockSpec((1, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(x)
Y = jax.random.normal(key, (6144, 512), jnp.float32)
sec = timed(jax.jit(cp2), Y) - OVH
print(f"pallas copy 12MB (6144 tiny steps): {sec*1000:.2f} ms -> {sec/6144*1e6:.2f} us/step", flush=True)
