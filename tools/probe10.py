"""Probe #10: where does the 1.57ms/grid-step overhead come from?"""
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
B, NV = 65536, 6144
vba = jax.random.normal(key, (B, 1, S3), jnp.float32)
depthT = jax.random.normal(key, (768, 512), jnp.float32)
ptrs = jax.random.permutation(key, B)[:NV].astype(jnp.int32)
seq = jnp.arange(NV, dtype=jnp.int32)
wv = jax.random.randint(key, (NV,), 0, 4, dtype=jnp.int32)
wu = jax.random.randint(key, (NV,), 0, 6, dtype=jnp.int32)

def attempt(name, *, dyn_in=True, dyn_out=True, alias=True, window=False, semantics=None, matmul=False):
    def kern(*refs):
        if window:
            p, v, u, row_ref, win_ref, out_ref = refs
        else:
            p, v, u, row_ref, out_ref = refs
        r = row_ref[0]
        if matmul:
            i = pl.program_id(0)
            vox = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 1)
            rid = jax.lax.broadcasted_iota(jnp.int32, (WIN, S3), 0)
            dv = (vox[0:1, :] * 3 + i) % WIN
            oh_v = (rid == dv).astype(jnp.float32)
            s1t = jnp.dot(win_ref[:], oh_v, preferred_element_type=jnp.float32)
            tap = jnp.sum(s1t * (rid == (dv * 7) % WIN), axis=0, keepdims=True)
            r = r + tap * 1e-3
        out_ref[0] = r * 1.000001

    in_specs = [pl.BlockSpec((1, 1, S3),
                (lambda i, p, v, u: (p[i], 0, 0)) if dyn_in else (lambda i, p, v, u: (i, 0, 0)),
                memory_space=pltpu.VMEM)]
    if window:
        in_specs.append(pl.BlockSpec((WIN, WIN), lambda i, p, v, u: (u[i], v[i]), memory_space=pltpu.VMEM))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NV,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, S3),
                 (lambda i, p, v, u: (p[i], 0, 0)) if dyn_out else (lambda i, p, v, u: (i, 0, 0)),
                 memory_space=pltpu.VMEM),
    )
    kw = {}
    if alias:
        kw["input_output_aliases"] = {3: 0}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(dimension_semantics=(semantics,))
    args = [ptrs if dyn_in or dyn_out else seq, wv, wu, vba] + ([depthT] if window else [])
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((B, 1, S3), jnp.float32), grid_spec=gs, **kw)(*a))
        sec = timed(f, *args)
        us = (sec-OVH)/NV*1e6
        print(f"{name:52s} {(sec-OVH)*1000:9.1f} ms  ({us:7.2f} us/step)", flush=True)
    except Exception as e:
        print(f"{name:52s} FAIL {str(e)[:90]}", flush=True)

attempt("copy static-in static-out no-alias", dyn_in=False, dyn_out=False, alias=False)
attempt("copy static-in static-out alias", dyn_in=False, dyn_out=False, alias=True)
attempt("copy dyn-in dyn-out alias", dyn_in=True, dyn_out=True, alias=True)
attempt("copy dyn-in dyn-out alias arbitrary", dyn_in=True, dyn_out=True, alias=True, semantics="arbitrary")
attempt("copy dyn-in dyn-out no-alias", dyn_in=True, dyn_out=True, alias=False)
attempt("copy+window dyn alias", dyn_in=True, dyn_out=True, alias=True, window=True)
attempt("matmul+window dyn alias", dyn_in=True, dyn_out=True, alias=True, window=True, matmul=True)
attempt("matmul+window static no-alias", dyn_in=False, dyn_out=False, alias=False, window=True, matmul=True)
