"""Probe #5: is block_until_ready honest on axon? Compare vs host transfer."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")

key = jax.random.PRNGKey(0)
K = 32

def chain_take_1d(tab, idx):
    T = tab.shape[0]
    def body(k, i):
        v = jnp.take(tab, i)
        return (i + v + k) % T
    return jax.lax.fori_loop(0, K, body, idx)

T = 1 << 21
N = 307200
tab = jax.random.randint(key, (T,), 0, T, dtype=jnp.int32)
idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
f = jax.jit(chain_take_1d)
o = f(tab, idx); _ = np.asarray(o)  # warm

# method A: block_until_ready
t0 = time.perf_counter()
for _ in range(3):
    o = f(tab, idx)
jax.block_until_ready(o)
tA = (time.perf_counter()-t0)/3/K*1000
# method B: host transfer of 4 bytes
t0 = time.perf_counter()
for _ in range(3):
    o = f(tab, idx)
    _ = np.asarray(o[0])
tB = (time.perf_counter()-t0)/3/K*1000
print(f"chained take 307k from 8MB: block_until_ready {tA:.4f} ms/op | host-xfer {tB:.4f} ms/op", flush=True)

# absolute sanity: something with a known FLOP cost — big matmul chain
A = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
def chain_mm(A):
    def body(k, X):
        return jnp.dot(X, X, preferred_element_type=jnp.bfloat16)*1e-3
    return jax.lax.fori_loop(0, K, body, A)
g = jax.jit(chain_mm)
o = g(A); _ = np.asarray(o[0,0])
t0 = time.perf_counter()
o = g(A); _ = np.asarray(o[0, 0])
tM = (time.perf_counter()-t0)/K*1000
flops = 2*4096**3
print(f"4096^3 bf16 matmul: {tM:.4f} ms/op -> {flops/tM/1e9:.1f} GFLOP/s (v5e peak ~197000)", flush=True)
