import time, jax, jax.numpy as jnp
def t(name, fn, *args, n=5):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")
key = jax.random.PRNGKey(0)
H, W = 480, 640
depth = jax.random.uniform(key, (H, W), jnp.float32, 0.5, 3.0)
for K in [8192, 16384, 32768, 65536]:
    vi = jax.random.randint(key, (K, 512), 0, H)
    ui = jax.random.randint(key, (K, 512), 0, W)
    t(f"gather from image K={K} ({K*512//1000000}M taps)",
      lambda v, u: depth[v, u].sum(), vi, ui)
# flat-index version
for K in [16384, 65536]:
    idx = jax.random.randint(key, (K, 512), 0, H*W)
    t(f"flat gather from image K={K}", lambda i: depth.reshape(-1)[i].sum(), idx)
# big table, small count
big = jnp.zeros((1<<25,), jnp.float32)
for n_ in [262144, 1048576]:
    idx = jax.random.randint(key, (n_,), 0, 1<<25)
    t(f"gather {n_//1024}k from 134MB table", lambda i: big[i].sum(), idx)
# medium table (visible-brick atlas size: 8k blocks x 512 = 16MB)
atlas = jnp.zeros((8192*512,), jnp.float32)
for n_ in [1048576, 4194304]:
    idx = jax.random.randint(key, (n_,), 0, 8192*512)
    t(f"gather {n_//1024}k from 16MB atlas", lambda i: atlas[i].sum(), idx)
