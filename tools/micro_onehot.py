"""Validate window-gather + separable one-hot MXU sampling vs scalar gather."""
import time, jax, jax.numpy as jnp
import functools
def t(name, fn, *args, n=5):
    f = jax.jit(fn); o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args); jax.block_until_ready(o)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")

key = jax.random.PRNGKey(0)
H, W = 480, 640
depth = jax.random.uniform(key, (H, W), jnp.float32, 0.5, 3.0)
K = 8192            # visible blocks processed
S3 = 512
P = 32              # patch size
# per-block patch origin + per-voxel pixel coords within patch
r0 = jax.random.randint(key, (K,), 0, H - P)
c0 = jax.random.randint(key, (K, ), 0, W - P)
vi = jax.random.randint(key, (K, S3), 0, P)   # row within patch
ui = jax.random.randint(key, (K, S3), 0, P)

def direct(depth, r0, c0, vi, ui):
    rr = r0[:, None] + vi
    cc = c0[:, None] + ui
    return depth[rr, cc].sum()

def windowed(depth, r0, c0, vi, ui):
    def slc(r, c):
        return jax.lax.dynamic_slice(depth, (r, c), (P, P))
    patches = jax.vmap(slc)(r0, c0)                     # [K,P,P]
    rsel = jax.nn.one_hot(vi, P, dtype=jnp.bfloat16)     # [K,S3,P]
    csel = jax.nn.one_hot(ui, P, dtype=jnp.bfloat16)     # [K,S3,P]
    tmp = jnp.einsum("krc,kvr->kvc", patches.astype(jnp.bfloat16), rsel)  # [K,S3,P]
    val = jnp.sum(tmp * csel, axis=-1)                   # [K,S3]
    return val.astype(jnp.float32).sum()

def windowed_f32(depth, r0, c0, vi, ui):
    def slc(r, c):
        return jax.lax.dynamic_slice(depth, (r, c), (P, P))
    patches = jax.vmap(slc)(r0, c0)
    rsel = jax.nn.one_hot(vi, P, dtype=jnp.float32)
    csel = jax.nn.one_hot(ui, P, dtype=jnp.float32)
    tmp = jnp.einsum("krc,kvr->kvc", patches, rsel)
    return jnp.sum(tmp * csel, axis=-1).sum()

t("direct scalar gather 4.2M taps", direct, depth, r0, c0, vi, ui)
t("window-gather + onehot MXU (bf16)", windowed, depth, r0, c0, vi, ui)
t("window-gather + onehot MXU (f32)", windowed_f32, depth, r0, c0, vi, ui)
# patches alone
t("patch extraction alone [8k,32,32]",
  lambda d, r, c: jax.vmap(lambda rr, cc: jax.lax.dynamic_slice(d, (rr, cc), (P, P)))(r, c).sum(),
  depth, r0, c0)
