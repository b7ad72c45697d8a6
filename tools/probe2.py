"""Probe #2: does Mosaic support per-lane gathers from VMEM, and how fast?"""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

def t(name, fn, *args, n=20):
    try:
        f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    except Exception as e:
        print(f"{name:55s} FAIL: {str(e)[:300]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter()-t0)/n*1000
    print(f"{name:55s} {ms:9.3f} ms", flush=True)

key = jax.random.PRNGKey(0)

# Test A: 1D take from a VMEM table
def kA(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

def callA(tab, idx):
    return pl.pallas_call(
        kA,
        out_shape=jax.ShapeDtypeStruct(idx.shape, tab.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)

tab = jax.random.normal(key, (262144,), jnp.float32)
idx = jax.random.randint(key, (256*1024,), 0, 262144)
t("pallas take 256k from 262k-f32 VMEM table", callA, tab, idx)

tab2 = jax.random.normal(key, (512*1024,), jnp.float32)
idx2 = jax.random.randint(key, (256*1024,), 0, 512*1024)
t("pallas take 256k from 512k-f32 VMEM table", callA, tab2, idx2)

# Test B: 2D table gather along axis 0 with per-lane index (rows)
def kB(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

def callB(tab, idx):
    return pl.pallas_call(
        kB,
        out_shape=jax.ShapeDtypeStruct(idx.shape, tab.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)

tabB = jax.random.normal(key, (1024, 128), jnp.float32)
idxB = jax.random.randint(key, (8, 128), 0, 1024)
t("pallas take_along_axis ax0 [1024,128] by [8,128]", callB, tabB, idxB)

# Test C: int8 1D take
tab8 = jnp.zeros((1<<21,), jnp.int8)
t("pallas take 256k from 2M-int8 VMEM table", callA, tab8, idx2)

# Test D: int32 1D take
tab32 = jnp.zeros((262144,), jnp.int32)
t("pallas take 256k from 262k-i32 VMEM table", callA, tab32, idx)

# Test E: XLA baseline same op
t("XLA take 256k from 262k table", lambda ta, i: jnp.take(ta, i), tab, idx)
