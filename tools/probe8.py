"""Probe #8: bisect which Pallas construct crashes the TPU compiler."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

key = jax.random.PRNGKey(0)
B, S3, NV, WIN = 4096, 512, 256, 128
vba = jax.random.normal(key, (B, 8, 64), jnp.float32)
depth = jax.random.normal(key, (512, 768), jnp.float32)
ptrs = jax.random.permutation(key, B)[:NV].astype(jnp.int32)
wv = jax.random.randint(key, (NV,), 0, 4, dtype=jnp.int32)
wu = jax.random.randint(key, (NV,), 0, 6, dtype=jnp.int32)

def attempt(name, kern, with_win=False, alias=True):
    in_specs = [pl.BlockSpec((1, 8, 64), lambda i, p, v, u: (p[i], 0, 0), memory_space=pltpu.VMEM)]
    if with_win:
        in_specs.append(pl.BlockSpec((WIN, WIN), lambda i, p, v, u: (v[i], u[i]), memory_space=pltpu.VMEM))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NV,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, 64), lambda i, p, v, u: (p[i], 0, 0), memory_space=pltpu.VMEM),
    )
    kwargs = dict(input_output_aliases={3: 0}) if alias else {}
    args = (ptrs, wv, wu, vba) + ((depth,) if with_win else ())
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((B, 8, 64), jnp.float32),
            grid_spec=gs, **kwargs)(*a))
        o = f(*args); _ = np.asarray(o[0, 0, 0])
        print(f"{name:50s} OK", flush=True)
    except Exception as e:
        print(f"{name:50s} FAIL {str(e)[:100]}", flush=True)

# K1: pure copy through dynamic in/out maps
def k1(p, v, u, row_ref, out_ref):
    out_ref[0] = row_ref[0] * 1.000001
attempt("K1 copy dyn-in dyn-out aliased", k1)
attempt("K1b copy no alias", k1, alias=False)

# K2: reshape (8,64)->(1,512)->back
def k2(p, v, u, row_ref, out_ref):
    r = row_ref[0].reshape(1, S3)
    out_ref[0] = (r * 1.000001).reshape(8, 64)
attempt("K2 reshape roundtrip", k2)

# K3: one-hot matmul [512,128]@[128,128]
def k3(p, v, u, row_ref, win_ref, out_ref):
    i = pl.program_id(0)
    lin = jax.lax.broadcasted_iota(jnp.int32, (S3, WIN), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S3, WIN), 1)
    dvk = (lin[:, 0:1] * 3 + i) % WIN
    oh_v = (col == dvk).astype(jnp.bfloat16)
    s1 = jnp.dot(oh_v, win_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    tap = jnp.sum(s1 * (col == (dvk * 7) % WIN), axis=1)
    out_ref[0] = (row_ref[0].reshape(1, S3) + tap[None, :] * 1e-3).reshape(8, 64)
attempt("K3 window one-hot matmul", k3, with_win=True)

# K4: window input only, no matmul
def k4(p, v, u, row_ref, win_ref, out_ref):
    out_ref[0] = row_ref[0] + jnp.sum(win_ref[:]) * 1e-9
attempt("K4 window fetch only", k4, with_win=True)

# K5: program_id + select
def k5(p, v, u, row_ref, out_ref):
    i = pl.program_id(0)
    keep = p[i] >= 0
    out_ref[0] = jnp.where(keep, row_ref[0] * 1.000001, row_ref[0])
attempt("K5 scalar read + where", k5)
