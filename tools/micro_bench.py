"""Microbench of TPU primitive costs relevant to the SLAM hot path (dev tool)."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:55s} {dt:9.3f} ms")


def main():
    key = jax.random.PRNGKey(0)
    B, S3 = 65536, 512
    table = jnp.zeros((B, S3), jnp.float32)
    flat = table.reshape(-1)
    Nvox = B * S3

    idx1m = jax.random.randint(key, (1_000_000,), 0, Nvox)
    idx307k = jax.random.randint(key, (307_200,), 0, Nvox)
    rows64k = jax.random.randint(key, (65536,), 0, B)
    rows8k = jax.random.randint(key, (8192,), 0, B)
    vals1m = jnp.ones((1_000_000,), jnp.float32)
    upd64k = jnp.ones((65536, S3), jnp.float32)
    upd8k = jnp.ones((8192, S3), jnp.float32)
    E = 0x120000
    etab = jnp.zeros((E,), jnp.int32)
    eidx460k = jax.random.randint(key, (460_800,), 0, E)
    eidx8k = jax.random.randint(key, (8192,), 0, E)

    t("gather 1M scalars from 33M table", lambda f, i: f[i].sum(), flat, idx1m)
    t("gather 307k scalars", lambda f, i: f[i].sum(), flat, idx307k)
    t("gather 307k x8 taps (2.5M)", lambda f, i: sum(f[(i + k) % Nvox] for k in range(8)).sum(), flat, idx307k)
    t("row-gather 64k x512 rows", lambda tb, r: tb[r].sum(), table, rows64k)
    t("row-gather 8k x512 rows", lambda tb, r: tb[r].sum(), table, rows8k)
    t("row-scatter 64k x512 rows", lambda tb, r, u: tb.at[r].set(u), table, rows64k, upd64k)
    t("row-scatter 8k x512 rows", lambda tb, r, u: tb.at[r].set(u), table, rows8k, upd8k)
    t("scalar-scatter 1M into 33M", lambda f, i, v: f.at[i].set(v), flat, idx1m, vals1m)
    t("scalar-scatter 460k into 1.18M", lambda e, i: e.at[i].set(1), etab, eidx460k)
    t("scalar-scatter 8k into 1.18M", lambda e, i: e.at[i].set(1), etab, eidx8k)
    t("scatter-min 4.2M into 4.8k", lambda z, i, v: z.at[i].min(v),
      jnp.full((4800,), 1e9), jax.random.randint(key, (4_194_304,), 0, 4800),
      jnp.ones((4_194_304,), jnp.float32))
    t("elementwise 33M (20 flops)", lambda tb: jnp.sin(tb * 1.1 + 0.3) * tb + tb * tb, table)
    t("cumsum 1.18M", lambda e: jnp.cumsum(e), etab)
    t("nonzero(size=64k) over 1.18M", lambda e: jnp.nonzero(e > 0, size=65536, fill_value=-1)[0], etab)
    t("sort 525k int32", lambda i: jnp.sort(i), jax.random.randint(key, (524_288,), 0, 1 << 30))
    t("while_loop 64 iters x 307k gathers",
      lambda f, i: jax.lax.fori_loop(
          0, 64, lambda k, acc: acc + f[(i + k * 37) % Nvox], jnp.zeros_like(i, jnp.float32)),
      flat, idx307k)


if __name__ == "__main__":
    main()
