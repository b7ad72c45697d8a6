"""Probe #3: characterize the fast-gather path: jnp.take vs x[i], table-size threshold."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

def t(name, fn, *args, n=20):
    try:
        f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    except Exception as e:
        print(f"{name:58s} FAIL: {str(e)[:150]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter()-t0)/n*1000
    print(f"{name:58s} {ms:9.3f} ms", flush=True)

key = jax.random.PRNGKey(0)
N = 307200
for logT in [18, 20, 21, 22, 23, 24, 25]:
    T = 1 << logT
    tab = jnp.zeros((T,), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T)
    t(f"take 307k from 2^{logT} f32 ({T*4//1024//1024}MB)", lambda ta, i: jnp.take(ta, i), tab, idx)
# int8 tables push the threshold?
for logT in [23, 24, 25, 26, 27]:
    T = 1 << logT
    tab = jnp.zeros((T,), jnp.int8)
    idx = jax.random.randint(key, (N,), 0, T)
    t(f"take 307k from 2^{logT} int8 ({T//1024//1024}MB)", lambda ta, i: jnp.take(ta, i), tab, idx)
# is x[i] really different?
T = 1 << 18
tab = jnp.zeros((T,), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T)
t("x[i] 307k from 2^18 f32", lambda ta, i: ta[i], tab, idx)
t("take+sum 307k from 2^18", lambda ta, i: jnp.take(ta, i).sum(), tab, idx)
# 2D image shaped index (the pipeline uses [H,W] indices)
idx2 = jax.random.randint(key, (480, 640), 0, T)
t("take [480,640]-idx from 2^18", lambda ta, i: jnp.take(ta, i), tab, idx2)
# clip mode explicitly
t("take mode=clip", lambda ta, i: jnp.take(ta, i, mode='clip'), tab, idx)
t("take mode=fill", lambda ta, i: jnp.take(ta, i, mode='fill'), tab, idx)
# gather rows: [V,512] tables
V = 65536
tabR = jnp.zeros((V, 512), jnp.float32)
idxR = jax.random.randint(key, (8192,), 0, V)
t("row-gather 8192x512 f32 from [65536,512] take", lambda ta, i: jnp.take(ta, i, axis=0), tabR, idxR)
t("row-gather 8192x512 f32 x[i]", lambda ta, i: ta[i], tabR, idxR)
idxR2 = jax.random.randint(key, (65536,), 0, V)
t("row-gather 65536x512 f32 take", lambda ta, i: jnp.take(ta, i, axis=0), tabR, idxR2)
# row scatter
valsR = jnp.zeros((8192, 512), jnp.float32)
t("row-scatter 8192x512 into [65536,512]", lambda ta, i, v: ta.at[i].set(v), tabR, idxR, valsR)
# elem scatter
vals = jnp.zeros((N,), jnp.float32)
t("scatter-set 307k into 2^18", lambda ta, i, v: ta.at[i].set(v), tab, idx, vals)
t("scatter-min 307k into 2^18", lambda ta, i, v: ta.at[i].min(v), tab, idx, vals)
