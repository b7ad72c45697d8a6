import time, jax, jax.numpy as jnp
def t(name, fn, *args, n=5):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:55s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")
key = jax.random.PRNGKey(0)
H, W = 480, 640
depth = jnp.full((H, W), 1.5, jnp.float32)
dflat = depth.reshape(-1)
big = jnp.zeros((1<<25,), jnp.float32)
vi = jax.random.randint(key, (65536, 512), 0, H)
ui = jax.random.randint(key, (65536, 512), 0, W)
flat_idx = vi * W + ui
idx33m_big = jax.random.randint(key, (65536, 512), 0, 1<<25)
t("2D adv-index depth[vi,ui] 33M", lambda v,u: depth[v,u].sum(), vi, ui)
t("1D flat gather from image 33M", lambda i: dflat[i].sum(), flat_idx)
t("1D flat gather 33M from 33M big", lambda i: big[i].sum(), idx33m_big)
t("take_along_axis flat 33M", lambda i: jnp.take(dflat, i.reshape(-1)).sum(), flat_idx)
