"""Probe #4: trustworthy gather costs via data-dependent chains inside one jit.

Each iteration's indices depend on the previous gather's result, so the device
cannot overlap or elide iterations. Cost per op = total / K.
"""
import time, functools, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

K = 32

def bench(name, make_fn, *args, n=3):
    try:
        f = jax.jit(make_fn)
        o = f(*args); jax.block_until_ready(o)
    except Exception as e:
        print(f"{name:58s} FAIL: {str(e)[:150]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter()-t0)/n/K*1000
    print(f"{name:58s} {ms:9.4f} ms/op", flush=True)

key = jax.random.PRNGKey(0)

def chain_take_1d(tab, idx):
    T = tab.shape[0]
    def body(k, i):
        v = jnp.take(tab, i)           # the op under test
        return (i + v + k) % T
    return jax.lax.fori_loop(0, K, body, idx)

def chain_index_1d(tab, idx):
    T = tab.shape[0]
    def body(k, i):
        v = tab[i]
        return (i + v + k) % T
    return jax.lax.fori_loop(0, K, body, idx)

for logT, N in [(18, 307200), (21, 307200), (25, 307200), (25, 76800), (21, 1228800)]:
    T = 1 << logT
    tab = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    bench(f"CHAIN take {N//1000}k from 2^{logT} i32 ({(T*4)>>20}MB)", chain_take_1d, tab, idx)

T = 1 << 21
tab = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
idx = jax.random.randint(key, (307200,), 0, T, dtype=jnp.int32)
bench("CHAIN x[i] 307k from 2^21 i32", chain_index_1d, tab, idx)

# row gather chain: [V,512] rows
def chain_rows(tab, idx):
    V = tab.shape[0]
    def body(k, i):
        rows = jnp.take(tab, i, axis=0)          # [n, 512]
        return (i + rows[:, 0] + k) % V
    return jax.lax.fori_loop(0, K, body, idx)

V = 65536
tabR = jax.random.randint(key, (V, 512), 0, V, dtype=jnp.int32)
for nR in [1024, 8192]:
    idxR = jax.random.randint(key, (nR,), 0, V, dtype=jnp.int32)
    bench(f"CHAIN row-gather {nR}x512 i32 from [65536,512]", chain_rows, tabR, idxR)

# scatter chain
def chain_scatter(tab, idx):
    T = tab.shape[0]
    def body(k, carry):
        ta, i = carry
        ta = ta.at[i].set(i + k)
        i = (i + ta[0] + k) % T
        return ta, i
    return jax.lax.fori_loop(0, K, body, (tab, idx))

T = 1 << 21
bench("CHAIN scatter-set 307k into 2^21", chain_scatter, tab, idx)
