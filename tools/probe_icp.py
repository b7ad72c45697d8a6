"""Per-level cost probe of the depth-ICP residual pass (dev tool)."""

import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/itpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from infinitam_tpu.ops import icp  # noqa: E402


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:45s} {dt:9.3f} ms")
    return out


def main():
    H, W = 480, 640
    rng = np.random.default_rng(0)
    pm = jnp.asarray(rng.uniform(-2, 2, size=(H, W, 4)), jnp.float32)
    nm = jnp.asarray(rng.uniform(-1, 1, size=(H, W, 4)), jnp.float32)
    proj = jnp.array([525.0, 525.0, 319.5, 239.5], jnp.float32)
    pose = jnp.eye(4)

    for lvl in range(5):
        h, w = H >> lvl, W >> lvl
        d = jnp.asarray(rng.uniform(0.5, 3.0, size=(h, w)), jnp.float32)
        vproj = proj * (0.5**lvl)

        def resid(d, pm, nm, pose, vproj=vproj):
            b, A, valid, _ = icp.compute_residuals(
                d, vproj, pm, nm, proj, pose, pose, 0.01
            )
            return icp.reduce_gh(b, A, valid)

        f = jax.jit(resid)
        timeit(f"residuals+reduce lvl{lvl} ({h}x{w})", f, d, pm, nm, pose)

    # isolate: the bilinear map taps alone at level 0
    from infinitam_tpu.ops.pixel import bilinear_with_holes_vec

    u = jnp.asarray(rng.uniform(0, W - 2, size=(H, W)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, H - 2, size=(H, W)), jnp.float32)

    def taps(pm, nm, u, v):
        a, ok = bilinear_with_holes_vec(pm, u, v)
        b, _ = bilinear_with_holes_vec(nm, u, v)
        return a.sum() + b.sum() + ok.sum()

    timeit("2x bilinear_with_holes_vec (307k)", jax.jit(taps), pm, nm, u, v)


if __name__ == "__main__":
    main()
