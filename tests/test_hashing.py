"""Unit tests for the voxel-block-hash layer: hash math, probe/alloc protocol
(reference: ITMRepresentationAccess.h hashIndex/pointToVoxelBlockPos,
ITMSceneReconstructionEngine_CUDA.cu allocation kernels)."""

import jax
import jax.numpy as jnp
import numpy as np

from infinitam_tpu.config import VoxelBlockHashParams, tiny_test_settings
from infinitam_tpu.engine import hash_volume as hv
from infinitam_tpu.ops.hashing import hash_index, point_to_block

HP = tiny_test_settings().hashing


def ref_hash(x, y, z, mask):
    """Literal re-expression of the reference hash for golden checks."""
    def u32(v):
        return np.uint32(np.int64(v) & 0xFFFFFFFF)

    with np.errstate(over="ignore"):
        h = ((u32(x) * u32(73856093)) ^ (u32(y) * u32(19349669))
             ^ (u32(z) * u32(83492791))) & u32(mask)
    return int(h)


def test_hash_index_golden():
    mask = 0xFFFFF
    for p in [(0, 0, 0), (1, 2, 3), (-1, -2, -3), (100, -50, 7)]:
        got = int(hash_index(jnp.array(p, dtype=jnp.int32), mask))
        assert got == ref_hash(*p, mask), p


def test_point_to_block_negative_coords():
    # reference pointToVoxelBlockPos uses floor division toward −∞
    pts = jnp.array([[0, 0, 0], [7, 7, 7], [8, 0, 0], [-1, -8, -9]], dtype=jnp.int32)
    block, linear = point_to_block(pts, 8)
    np.testing.assert_array_equal(block, [[0, 0, 0], [0, 0, 0], [1, 0, 0], [-1, -1, -2]])
    # local(-1,-8,-9) = (-1-(-8), -8-(-8), -9-(-16)) = (7, 0, 7)
    np.testing.assert_array_equal(linear, [0, 7 + 7 * 8 + 7 * 64, 0, 7 + 0 + 7 * 64])


@jax.jit
def _probe_jit(vol, pts):
    return hv.probe(vol, pts, HP)


@jax.jit
def _alloc_jit(vol, cand, valid):
    visible_type = jnp.zeros((HP.n_entries,), dtype=jnp.int32)
    plan = hv.plan_allocations(vol, visible_type, cand, valid, HP)
    return hv.execute_allocations(vol, plan, HP)


def _alloc_blocks(vol, blocks):
    """Plan+execute allocation of the given block coords (padded to a fixed
    candidate count so every call shares one compiled program)."""
    cand = np.zeros((8, 3), dtype=np.int32)
    blocks = np.asarray(blocks, dtype=np.int32)
    cand[: len(blocks)] = blocks
    valid = np.zeros((8,), dtype=bool)
    valid[: len(blocks)] = True
    return _alloc_jit(vol, jnp.asarray(cand), jnp.asarray(valid))


def test_alloc_and_probe_roundtrip():
    vol = hv.create_hash(HP)
    blocks = [[0, 0, 0], [1, 2, 3], [-4, 5, -6], [10, 10, 10]]
    vol, vt = _alloc_blocks(vol, blocks)
    assert int(vol.last_free_block) == HP.n_blocks - 2 - 4  # row B-1 is the reserved sentinel

    pr = _probe_jit(vol, jnp.asarray(blocks, dtype=jnp.int32))
    assert bool(jnp.all(pr.found))
    # all four got distinct blocks
    assert len(set(np.asarray(pr.entry_ptr).tolist())) == 4

    # unknown block is not found
    pr2 = _probe_jit(vol, jnp.array([9, 9, 9], dtype=jnp.int32))
    assert not bool(pr2.found)


def test_alloc_collision_goes_to_excess():
    """Two blocks hashing to the same bucket: second lands in the excess list
    on the NEXT frame (same-frame dedup defers one — reference's benign
    collision semantics)."""
    mask = HP.hash_mask
    # precomputed colliding pair for mask 0xFFF (verified via ref_hash)
    base = (3, 1, 2)
    other = (0, 94, 6)
    assert ref_hash(*base, mask) == ref_hash(*other, mask)

    vol = hv.create_hash(HP)
    # frame 1: both requested, one wins
    vol, _ = _alloc_blocks(vol, [list(base), list(other)])
    pr = _probe_jit(vol, jnp.array([base, other], dtype=jnp.int32))
    assert int(jnp.sum(pr.found)) == 1

    # frame 2: the loser retries and lands in the excess chain
    vol, _ = _alloc_blocks(vol, [list(base), list(other)])
    pr = _probe_jit(vol, jnp.array([base, other], dtype=jnp.int32))
    assert bool(jnp.all(pr.found))
    idxs = np.asarray(pr.entry_idx)
    assert (idxs >= HP.n_buckets).sum() == 1  # one lives in the excess part
    assert int(vol.last_free_excess) == HP.n_excess - 2


def test_alloc_idempotent():
    """Re-requesting existing blocks allocates nothing (property analogue of
    the reference's visible-only marking)."""
    vol = hv.create_hash(HP)
    vol, _ = _alloc_blocks(vol, [[1, 1, 1], [2, 2, 2]])
    free_before = int(vol.last_free_block)
    vol, _ = _alloc_blocks(vol, [[1, 1, 1], [2, 2, 2]])
    assert int(vol.last_free_block) == free_before


def test_hash_reader_roundtrip():
    vol = hv.create_hash(HP)
    vol, _ = _alloc_blocks(vol, [[0, 0, 0]])
    pr = _probe_jit(vol, jnp.array([0, 0, 0], dtype=jnp.int32))
    blk = int(pr.entry_ptr)
    # write a voxel: global (3, 4, 5) in block (0,0,0) → linear 3+4·8+5·64
    vol = vol._replace(
        vox=vol.vox.at[blk, 3 + 32 + 320].set(hv.pack_vox(hv.sdf_to_q(-0.5), 1))
    )
    read = hv.make_hash_reader(vol, HP)
    sdf, found = read(jnp.array([3, 4, 5], dtype=jnp.int32))
    assert bool(found) and abs(float(sdf) + 0.5) < 1e-4
    # voxel in an unallocated block reads as empty space
    sdf, found = read(jnp.array([100, 100, 100], dtype=jnp.int32))
    assert not bool(found) and float(sdf) == 1.0


def test_visible_list_compaction():
    vol = hv.create_hash(HP)
    vol, vt = _alloc_blocks(vol, [[0, 0, 1], [0, 0, 2], [5, 5, 5]])
    proj = jnp.array([60.0, 60.0, 40.0, 30.0])
    # camera at origin looking +z with ~60×80 image: blocks at z≈1-2 blocks
    # (0.16 m each) are in front; (5,5,5) projects far off-image
    rs = hv.build_visible_list(
        vol, vt, jnp.eye(4), proj, (60, 80), 0.02, HP
    )
    ids = np.asarray(rs.visible_ids)
    n = int(rs.n_visible)
    assert n == int((np.asarray(rs.visible_type) > 0).sum())
    assert (ids[:n] >= 0).all() and (ids[n:] == -1).all()


def test_sdf_quantization_roundtrip_and_accuracy():
    """Storage quantization (reference ITMVoxel_s: sdf int16 x32767,
    weights/colors uint8): round-trip error bounded by half an LSB, and the
    fused surface position stays well below the voxel size."""
    import numpy as np

    f = jnp.linspace(-1.0, 1.0, 1001)
    back = hv.sdf_from_q(hv.sdf_to_q(f))
    assert float(jnp.max(jnp.abs(back - f))) <= 0.5 / 32767.0 + 1e-7

    # clamping semantics: out-of-range floats clamp like the reference's
    # short cast after the fusion clamp
    assert int(hv.sdf_to_q(jnp.float32(2.0))) == 32767
    assert int(hv.sdf_to_q(jnp.float32(-2.0))) == -32767

    c = jnp.linspace(0.0, 1.0, 256)
    cq = hv.clr_from_q(hv.clr_to_q(c))
    assert float(jnp.max(jnp.abs(cq - c))) <= 0.5 / 255.0 + 1e-7


def test_incremental_caches_match_rebuild():
    """The incrementally-maintained accelerator caches (entry_grid /
    block_grid) must stay exact mirrors of the hash state
    across inserts, swap-out eviction and swapped-in reallocation."""
    from infinitam_tpu.config import tiny_test_settings
    from infinitam_tpu.engine import swapping as sw

    settings = tiny_test_settings()
    hp_ = settings.hashing
    gp = settings.block_grid
    vol = hv.create_hash(hp_, grid_params=gp)
    vt = jnp.zeros((hp_.n_entries,), dtype=jnp.int32)

    rng = np.random.default_rng(0)
    for step in range(3):
        blocks = jnp.asarray(
            rng.integers(-8, 12, size=(16, 3)), dtype=jnp.int32
        )
        valid = jnp.asarray(rng.random(16) < 0.8)
        vol, vt, _ = hv.insert_blocks(vol, vt, blocks, valid, hp_, grid_params=gp)
        vol, vt, _ = hv.insert_blocks(vol, vt, blocks, valid, hp_, grid_params=gp)

    def check(v):
        ref = hv.refresh_caches(v, gp)
        np.testing.assert_array_equal(np.asarray(v.entry_grid), np.asarray(ref.entry_grid))
        np.testing.assert_array_equal(np.asarray(v.block_grid), np.asarray(ref.block_grid))

    check(vol)

    # swap-out eviction: invisible state-2 entries lose their block
    swap_states = jnp.full((hp_.n_entries,), 2, dtype=jnp.int32)
    vt0 = jnp.zeros_like(vt)  # everything invisible -> evictable
    vol2, _ss, _ids, _bs, _bw, _bc, _bwc, n = sw.evict_blocks(
        vol, swap_states, vt0, settings
    )
    assert int(n) > 0
    check(vol2)

    # reallocation of swapped-out entries that became visible again
    E = hp_.n_entries
    vis_ids = jnp.nonzero(
        vol2.entry_ptr == hv.SWAPPED_PTR, size=hp_.max_visible_blocks, fill_value=-1
    )[0].astype(jnp.int32)
    vt2 = jnp.zeros((E,), jnp.int32).at[jnp.where(vis_ids >= 0, vis_ids, E)].set(
        hv.VT_VISIBLE, mode="drop"
    )
    vol3 = sw.reallocate_swapped_out(vol2, vt2, settings, visible_ids=vis_ids)
    assert int(jnp.sum(vol3.entry_ptr == hv.SWAPPED_PTR)) == 0
    check(vol3)
