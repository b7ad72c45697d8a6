import time, jax, jax.numpy as jnp
def t(name, fn, *args, n=10):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:45s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")
def t_pipelined(name, fn, *args, n=10):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:45s} {(time.perf_counter()-t0)/n*1000:9.3f} ms (pipelined)")
x = jnp.zeros(())
e = jnp.zeros((1_179_648,), jnp.int32)
big = jnp.zeros((8192, 512), jnp.float32)
t("scalar add (dispatch floor)", lambda a: a + 1.0, x)
t_pipelined("scalar add (dispatch floor)", lambda a: a + 1.0, x)
t("where over 1.18M int32", lambda a: jnp.where(a == 3, 1, a), e)
t_pipelined("where over 1.18M int32", lambda a: jnp.where(a == 3, 1, a), e)
t("add over 4M f32", lambda a: a + 1.0, big)
t_pipelined("add over 4M f32", lambda a: a + 1.0, big)
