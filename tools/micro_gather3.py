import time, jax, jax.numpy as jnp
def t(name, fn, *args, n=5):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:45s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")
key = jax.random.PRNGKey(0)
big = jnp.zeros((1<<25,), jnp.float32)
for m in [1, 2, 4, 8, 16, 32]:
    idx = jax.random.randint(key, (m*1024*1024,), 0, 1<<25)
    t(f"gather {m}M from 33M", lambda i: big[i].sum(), idx)
for m in [1, 2, 4, 8]:
    idx = jax.random.randint(key, (m*1024*1024,), 0, 1<<25)
    vals = jnp.ones((m*1024*1024,), jnp.float32)
    t(f"scatter-set {m}M into 33M", lambda i, v: big.at[i].set(v), idx, vals)
for m in [2, 8, 33]:
    n = m*1024*1024 if m < 33 else (1<<25)
    idx = jax.random.randint(key, (n,), 0, 1<<25)
    t(f"gather {m}M SORTED", lambda i: big[i].sum(), jnp.sort(idx))
