"""Bisect integrate_into_scene cost on TPU (dev tool)."""

import time

import jax
import jax.numpy as jnp

from infinitam_tpu.ops.pixel import bilinear  # noqa: F401


def t(name, fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/n*1000:9.3f} ms")


def main():
    key = jax.random.PRNGKey(0)
    V, S3 = 65536, 512
    H, W = 480, 640
    B = 65536
    table = jnp.zeros((B, S3), jnp.float32)
    wtab = jnp.zeros((B, S3), jnp.float32)
    ptr = jax.random.randint(key, (V,), 0, B)
    bpos = jax.random.randint(key, (V, 3), -100, 100)
    depth = jnp.full((H, W), 1.5, jnp.float32)
    M = jnp.eye(4)
    proj = jnp.array([525.0, 525.0, 320.0, 240.0])

    def stage_pts(bpos):
        lin = jnp.arange(S3, dtype=jnp.int32)
        local = jnp.stack([lin % 8, (lin // 8) % 8, lin // 64], axis=-1)
        gvox = bpos[:, None, :] * 8 + local[None, :, :]
        return gvox.astype(jnp.float32) * 0.01

    t("pt_world [V,512,3]", lambda b: stage_pts(b).sum(), bpos)

    def stage_proj(bpos):
        pw = stage_pts(bpos)
        pc = jnp.einsum("ij,...j->...i", M[:3, :3], pw) + M[:3, 3]
        z = pc[..., 2]
        u = proj[0] * pc[..., 0] / jnp.where(z > 0, z, 1.0) + proj[2]
        v = proj[1] * pc[..., 1] / jnp.where(z > 0, z, 1.0) + proj[3]
        return u.sum() + v.sum()

    t("+ project (einsum 3x3)", stage_proj, bpos)

    def stage_proj2(bpos):
        pw = stage_pts(bpos)
        R = M[:3, :3]
        pc0 = pw[..., 0] * R[0, 0] + pw[..., 1] * R[0, 1] + pw[..., 2] * R[0, 2] + M[0, 3]
        pc1 = pw[..., 0] * R[1, 0] + pw[..., 1] * R[1, 1] + pw[..., 2] * R[1, 2] + M[1, 3]
        pc2 = pw[..., 0] * R[2, 0] + pw[..., 1] * R[2, 1] + pw[..., 2] * R[2, 2] + M[2, 3]
        u = proj[0] * pc0 / jnp.where(pc2 > 0, pc2, 1.0) + proj[2]
        v = proj[1] * pc1 / jnp.where(pc2 > 0, pc2, 1.0) + proj[3]
        return u.sum() + v.sum()

    t("+ project (unrolled scalar)", stage_proj2, bpos)

    def stage_depth_tap(bpos):
        pw = stage_pts(bpos)
        pc = jnp.einsum("ij,...j->...i", M[:3, :3], pw) + M[:3, 3]
        z = pc[..., 2]
        u = proj[0] * pc[..., 0] / jnp.where(z > 0, z, 1.0) + proj[2]
        v = proj[1] * pc[..., 1] / jnp.where(z > 0, z, 1.0) + proj[3]
        ui = jnp.clip((u + 0.5).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip((v + 0.5).astype(jnp.int32), 0, H - 1)
        return depth[vi, ui].sum()

    t("+ depth tap (33M gathers from image)", stage_depth_tap, bpos)

    def full(table, wtab, ptr, bpos):
        old = table[ptr]
        ow = wtab[ptr]
        pw = stage_pts(bpos)
        pc = jnp.einsum("ij,...j->...i", M[:3, :3], pw) + M[:3, 3]
        z = pc[..., 2]
        u = proj[0] * pc[..., 0] / jnp.where(z > 0, z, 1.0) + proj[2]
        v = proj[1] * pc[..., 1] / jnp.where(z > 0, z, 1.0) + proj[3]
        ui = jnp.clip((u + 0.5).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip((v + 0.5).astype(jnp.int32), 0, H - 1)
        dm = depth[vi, ui]
        eta = dm - z
        nf = jnp.minimum(1.0, eta / 0.04)
        mf = (ow * old + nf) / (ow + 1)
        do = (z > 0) & (dm > 0) & (eta >= -0.04)
        ns = jnp.where(do, mf, old)
        nw = jnp.where(do, jnp.minimum(ow + 1, 100), ow)
        t2 = table.at[ptr].set(ns, mode="drop")
        w2 = wtab.at[ptr].set(nw, mode="drop")
        return t2, w2

    t("FULL gather+update+scatter", full, table, wtab, ptr, bpos)


if __name__ == "__main__":
    main()
