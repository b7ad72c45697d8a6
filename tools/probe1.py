"""Primitive-cost probe #1: flat gathers at raycast-relevant sizes."""
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def t(name, fn, *args, n=10):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter()-t0)/n*1000
    print(f"{name:55s} {ms:9.3f} ms", flush=True)

key = jax.random.PRNGKey(0)
big = jnp.zeros((1<<25,), jnp.float32)
big8 = jnp.zeros((1<<25,), jnp.int8)
for m in [0.3, 1, 4]:
    N = int(m*1024*1024)
    idx = jax.random.randint(key, (N,), 0, 1<<25)
    t(f"gather {m}M f32 from 33M", lambda i: big[i].sum(), idx)
    t(f"gather {m}M int8 from 33M", lambda i: big8[i].astype(jnp.float32).sum(), idx)
# small table
small = jnp.zeros((1<<18,), jnp.float32)  # 262144 = block grid
idx3 = jax.random.randint(key, (307200,), 0, 1<<18)
t("gather 307k f32 from 262k table", lambda i: small[i].sum(), idx3)
img = jnp.zeros((480*640,), jnp.float32)
t("gather 307k f32 from 307k img", lambda i: img[i].sum(), jax.random.randint(key, (307200,), 0, 480*640))
