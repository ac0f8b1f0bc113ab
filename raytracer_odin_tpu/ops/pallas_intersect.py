"""Pallas TPU intersection kernels.

Measured reality on TPU v5e: XLA lowers per-lane gather loops (the classic
GPU-style BVH walk) onto the scalar core — ~0.1 Mrays/s and minutes of
compile time. The TPU-native shape of the problem is *dense sweeps in VMEM*:

  * rays live in lanes: a block of RB rays is a (1, RB) vector per component;
  * triangles live in sublanes: a cluster of 64 consecutive (BVH-ordered)
    triangles is a (64, 1) column per component;
  * one cluster x ray-block intersection test is ~70 elementwise ops on
    (64, RB) tiles — pure VPU, no gathers, no divergence.

Kernels:
  * `intersect_brute` — every ray block against every cluster. Replaces
    cast_ray_through_trigs (raytracer.odin:351-369) wholesale.
  * `intersect_culled` — every ray block against only the clusters whose
    AABB its ray-bundle frustum can hit, via a per-block cluster list
    computed in XLA (ops/culling.py) and delivered through scalar prefetch;
    the in-kernel loop has a data-dependent trip count. This is the
    TPU-native replacement for per-ray BVH traversal
    (raytracer.odin:371-414): the hierarchy cull happens per coherent ray
    bundle on dense math, not per ray on a stack.

Triangle layout: [Tpad, 12] f32 (VMEM-resident) or [Tpad, 128] f32
(DMA-streamed; Mosaic HBM slices must be 128-lane aligned), BVH/perm order
padded to a multiple of LEAF=64 with degenerate rows; columns = px py pz
ux uy uz vx vy vz (rest pad).
Ray layout: [8, Npad] f32 rows = ox oy oz dx dy dz (2 pad).
Output: [8, Npad] f32 rows = t, tri_index (as f32; exact below 2^24);
barycentrics are recomputed per lane at shade time (see unpack_hits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Tunables (fixed per process; benchmarks sweep them via env):
LEAF = int(_os.environ.get("RT_TPU_LEAF", 64))  # triangles per cluster
RB = int(_os.environ.get("RT_TPU_RB", 512))     # rays per bundle
# Cluster-list granularity INSIDE a kernel block: lists are built per
# RB_SUB-lane sub-block (tighter unions: measured mean 7.6 clusters at 256
# lanes vs 9.3 at 512 on demo bounce-1 rays) while the kernel grid, its
# per-block fixed costs, and the coherence sort stay at RB. RB_SUB == RB
# disables sub-lists (single list per block, the pre-r3 behavior).
# Measured on the 1080p demo bench (real v5e): 256 -> 24.3 Mrays/s vs
# 23.6 disabled; 128 REGRESSES to 22.1 — each (LEAF, RB_SUB) cluster test
# reloads the triangle tile, so narrower sub-blocks amortize that load
# over fewer lanes and the 0.58x list tightness loses to the 4x reload.
RB_SUB = int(_os.environ.get("RT_TPU_RB_SUB", 256))
if RB % RB_SUB:
    raise ValueError(f"RT_TPU_RB_SUB={RB_SUB} must divide RT_TPU_RB={RB}")
BIG = 3.0e38


def _rcp(x):
    """Reciprocal: approximate VPU reciprocal + one Newton step on TPU
    (~1e-7 relative error, much cheaper than a full divide); exact division
    in interpreter mode where the approx primitive is unavailable."""
    if _interpret():
        return 1.0 / x
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _cluster_test(tris_ref, base, ox, oy, oz, dx, dy, dz,
                  best_t, best_i, index_base=None):
    """Test LEAF consecutive triangles (starting at row `base` of tris_ref)
    against the ray block. All ray inputs (1, RB); returns updated
    (best_t, best_i). `index_base` is the global triangle index of row
    `base` (defaults to base; the streaming kernel reads from a local
    scratch but must report global indices).

    The kernel returns only the hit DECISION (t, triangle index): the
    winner's barycentrics are recomputed per lane at shade time from the
    shade_row gather that material evaluation pays anyway
    (integrator._point_material) — selecting u/v in here cost two extra
    sublane reduces + a one-hot select per cluster test (trace-measured
    ~15% of the sweep kernel, the single largest device-time bucket)."""
    if index_base is None:
        index_base = base

    def col(j):
        return tris_ref[pl.ds(base, LEAF), j:j + 1]  # (LEAF, 1)

    px, py, pz = col(0), col(1), col(2)
    ux, uy, uz = col(3), col(4), col(5)
    vx, vy, vz = col(6), col(7), col(8)

    # pvec = d x v  -> (LEAF, RB)
    pvx = dy * vz - dz * vy
    pvy = dz * vx - dx * vz
    pvz = dx * vy - dy * vx
    det = ux * pvx + uy * pvy + uz * pvz
    inv = _rcp(det)
    tx = ox - px
    ty = oy - py
    tz = oz - pz
    bu = (tx * pvx + ty * pvy + tz * pvz) * inv
    # qvec = tvec x u
    qx = ty * uz - tz * uy
    qy = tz * ux - tx * uz
    qz = tx * uy - ty * ux
    bv = (dx * qx + dy * qy + dz * qz) * inv
    t = (vx * qx + vy * qy + vz * qz) * inv

    # Inside test folded to one sign check (NaNs propagate -> compare
    # false, same kill rule as the reference's comparison).
    inside = jnp.minimum(jnp.minimum(bu, bv), 1.0 - (bu + bv)) >= 0
    ok = inside & (t > 0) & (t < best_t)
    t_ok = jnp.where(ok, t, BIG)
    tmin = jnp.min(t_ok, axis=0, keepdims=True)          # (1, RB)
    better = tmin < best_t

    # smallest triangle row achieving tmin (exact winner selection)
    rows = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 1), 0).astype(jnp.float32)
    row_sel = jnp.where(t_ok <= tmin, rows, jnp.float32(LEAF))
    win_row = jnp.min(row_sel, axis=0, keepdims=True)     # (1, RB)

    idx = jnp.asarray(index_base, jnp.float32) + win_row
    best_i = jnp.where(better, idx, best_i)
    best_t = jnp.where(better, tmin, best_t)
    return best_t, best_i


def _finish(out_ref, best_t, best_i):
    pad = jnp.zeros_like(best_t)
    out_ref[:] = jnp.concatenate(
        [best_t, best_i, pad, pad, pad, pad, pad, pad], axis=0
    )


def _brute_kernel(rays_ref, tris_ref, out_ref, *, n_clusters: int):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    init = (
        jnp.full((1, RB), BIG, jnp.float32),
        jnp.full((1, RB), -1.0, jnp.float32),
    )

    def body(c, carry):
        return _cluster_test(
            tris_ref, c * LEAF, ox, oy, oz, dx, dy, dz, *carry
        )

    best_t, best_i = jax.lax.fori_loop(0, n_clusters, body, init)
    _finish(out_ref, best_t, best_i)


def _culled_kernel(counts_ref, lists_ref, rays_ref, tris_ref,
                   out_ref, *, n_clusters: int):
    """counts/lists arrive via scalar prefetch (SMEM), one row per RB_SUB
    ray sub-block: lists_ref[s, k] is the k-th cluster id for sub-block s,
    k < counts_ref[s]; count == -1 marks list overflow (sweep every
    cluster). The grid stays at RB-lane blocks (per-block fixed costs are
    what made narrower kernel blocks a wash); each block runs its RB/RB_SUB
    sub-blocks' tighter lists back to back on (LEAF, RB_SUB) tiles.

    The sweep is deliberately BRANCH-FREE: every listed cluster is tested
    unconditionally. A best-t early-out (slab-prune each cluster, skip via
    pl.when) was measured at ~1.5 us per gated iteration — the scalar core
    must wait on a cross-lane vector reduce before it can branch, stalling
    the pipeline — while an unconditional 64-triangle cluster test is pure
    pipelined VPU work (~0.3 us at RB=512). The exact per-ray masks
    (cluster_masks) already make the lists tight, so dense-sweeping them is
    strictly faster than pruning them."""
    b = pl.program_id(0)
    n_sub = RB // RB_SUB
    outs = []
    for j in range(n_sub):
        lo = j * RB_SUB
        ox = rays_ref[0:1, lo:lo + RB_SUB]
        oy = rays_ref[1:2, lo:lo + RB_SUB]
        oz = rays_ref[2:3, lo:lo + RB_SUB]
        dx = rays_ref[3:4, lo:lo + RB_SUB]
        dy = rays_ref[4:5, lo:lo + RB_SUB]
        dz = rays_ref[5:6, lo:lo + RB_SUB]

        count = counts_ref[b * n_sub + j]
        overflow = count < 0
        n = jnp.where(overflow, n_clusters, count)

        init = (
            jnp.full((1, RB_SUB), BIG, jnp.float32),
            jnp.full((1, RB_SUB), -1.0, jnp.float32),
        )

        def body(k, carry, _j=j, _ov=overflow,
                 _ox=ox, _oy=oy, _oz=oz, _dx=dx, _dy=dy, _dz=dz):
            cid = jnp.where(
                _ov, k,
                lists_ref[b * n_sub + _j,
                          jnp.minimum(k, lists_ref.shape[1] - 1)],
            )
            return _cluster_test(
                tris_ref, cid * LEAF, _ox, _oy, _oz, _dx, _dy, _dz, *carry
            )

        outs.append(jax.lax.fori_loop(0, n, body, init))
    best_t = jnp.concatenate([o[0] for o in outs], axis=1)
    best_i = jnp.concatenate([o[1] for o in outs], axis=1)
    _finish(out_ref, best_t, best_i)


def _culled_stream_kernel(counts_ref, lists_ref, rays_ref, tris_hbm,
                          out_ref, scratch_ref, sem_ref, *, n_clusters: int):
    """Streaming variant for scenes too large for VMEM residency: the
    triangle array stays in HBM; each cluster's LEAF rows are DMA'd into a
    double-buffered VMEM scratch, overlapping the copy of cluster k+1 with
    the intersection math of cluster k (pallas_guide double-buffer pattern).
    """
    b = pl.program_id(0)
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    count = counts_ref[b]
    overflow = count < 0
    n = jnp.where(overflow, n_clusters, count)

    def cid_of(k):
        return jnp.where(
            overflow, k, lists_ref[b, jnp.minimum(k, lists_ref.shape[1] - 1)]
        )

    def dma(slot, k):
        return pltpu.make_async_copy(
            tris_hbm.at[pl.ds(cid_of(k) * LEAF, LEAF), :],
            scratch_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    init = (
        jnp.full((1, RB), BIG, jnp.float32),
        jnp.full((1, RB), -1.0, jnp.float32),
    )

    def body(k, carry):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < n)
        def _():
            dma(nxt, k + 1).start()

        dma(slot, k).wait()
        return _cluster_test(
            scratch_ref.at[slot], 0, ox, oy, oz, dx, dy, dz, *carry,
            index_base=cid_of(k) * LEAF,
        )

    best_t, best_i = jax.lax.fori_loop(0, n, body, init)
    _finish(out_ref, best_t, best_i)


def _mask_kernel(rays_ref, aabb_ref, out_ref, *, n_words: int,
                 n_bits: int = None, tmax_row: bool = False):
    """Exact per-ray cluster masks, bit-packed: out rows 0..n_words-1 are
    int32 words, bit c%32 of word c//32 = slab hit of cluster c. Clusters
    are tested 8 at a time in sublanes against RB rays in lanes; the whole
    pass reads each ray once (the XLA formulation of the same test cost
    ~49 ms/step in [N, 32] intermediates; this kernel is compute-shaped).

    aabb_ref: [n_words*32, 8] f32, cols = lo.xyz, hi.xyz, pad, pad.
    Padding clusters carry (BIG, -BIG) boxes — but the swapped slab test
    treats an inverted box as UNBOUNDED (per-axis min/max reorders the
    slabs), so their bits come out 1, not 0. With n_bits set, bits >=
    n_bits are zeroed in the output; _lex_sort_keys's header fold (and
    dead-lane compaction's alive-prefix invariant) REQUIRE this — a stray
    pad bit above the real clusters would swallow the dead|octant header.

    tmax_row=True reads a per-ray occlusion bound from ray row 6 and adds
    `near <= tmax` to the hit test: a cluster whose slab entry lies beyond
    an already-found hit cannot contain a nearer one (every triangle hit
    inside an AABB has t >= the ray's entry distance into that AABB) — the
    t-bounded second phase of two-phase culling (traverse.cast_presorted).
    """
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    # Clamp |d| components away from zero (sign-preserving) so the slab
    # products can never hit 0 * inf = NaN — this deletes two isnan+select
    # pairs per axis per cluster group (trace-measured ~25% of the kernel).
    # Conservative: a true |d| < TINY moves < BIG*TINY ~ 3e8 units on that
    # axis only at astronomically large t; real hits (t <= scene diameter)
    # are never culled, and origins exactly on a slab plane now get the
    # exact [0, huge] window instead of the old fully-unbounded fallback.
    TINY = jnp.float32(1e-30)

    def safe_inv(dc):
        return 1.0 / jnp.where(
            jnp.abs(dc) >= TINY, dc, jnp.where(dc < 0, -TINY, TINY)
        )

    ivx = safe_inv(rays_ref[3:4, :])
    ivy = safe_inv(rays_ref[4:5, :])
    ivz = safe_inv(rays_ref[5:6, :])
    tmax = rays_ref[6:7, :] if tmax_row else None

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def axis(lo, hi, o, iv):
        t1 = (lo - o) * iv
        t2 = (hi - o) * iv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    for w in range(n_words):
        # Accumulate the word's 4 cluster groups in (8, RB) sublanes and
        # reduce ONCE per word (bits are disjoint, so sum == bitwise or).
        acc = jnp.zeros((8, rays_ref.shape[1]), jnp.int32)
        for g in range(4):  # 4 sublane groups of 8 clusters per word
            base = w * 32 + g * 8

            def col(j):
                return aabb_ref[pl.ds(base, 8), j:j + 1]  # (8, 1)

            nx, xx = axis(col(0), col(3), ox, ivx)
            ny, xy = axis(col(1), col(4), oy, ivy)
            nz, xz = axis(col(2), col(5), oz, ivz)
            near = jnp.maximum(jnp.maximum(nx, ny), nz)
            far = jnp.minimum(jnp.minimum(xx, xy), xz)
            hit = (near <= far) & (far >= 0)  # (8, RB)
            if tmax is not None:
                hit = hit & (near <= tmax)
            bits = jnp.left_shift(jnp.int32(1), g * 8 + sub)
            acc = acc + jnp.where(hit, bits, 0)
        word = jnp.sum(acc, axis=0, keepdims=True, dtype=jnp.int32)
        if n_bits is not None:
            used = n_bits - w * 32
            if used <= 0:
                word = jnp.zeros_like(word)
            elif used < 32:
                word = jnp.bitwise_and(word, jnp.int32((1 << used) - 1))
        out_ref[w:w + 1, :] = word
    out_rows = out_ref.shape[0]
    if n_words < out_rows:
        out_ref[n_words:out_rows, :] = jnp.zeros(
            (out_rows - n_words, rays_ref.shape[1]), jnp.int32
        )


def cluster_masks_rows(aabb8, rays, n_clusters: int = None,
                       tmax_row: bool = False):
    """cluster_masks_packed for rays already in the kernel-native [8, Npad]
    row layout (rows = ox oy oz dx dy dz, 2 pad; Npad % RB == 0). Skips the
    [N, 3] -> [8, N] transpose — callers holding per-component columns
    (sorted wavefronts) build the rows with one cheap axis-0 stack instead.
    tmax_row=True reads a per-ray occlusion bound from ray row 6 (see
    _mask_kernel). Returns [W, Npad] int32 words."""
    n_words = aabb8.shape[0] // 32
    npad = rays.shape[1]
    # Output rows: sublane-padded word count (8-row minimum). Scenes with
    # more than 256 exact bits (RT_TPU_MAX_EXACT > 256) need > 8 rows.
    out_rows = max(8, -(-n_words // 8) * 8)
    out = pl.pallas_call(
        functools.partial(_mask_kernel, n_words=n_words, n_bits=n_clusters,
                          tmax_row=tmax_row),
        grid=(npad // RB,),
        in_specs=[
            pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (aabb8.shape[0], 8), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, RB), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows, npad), jnp.int32),
        interpret=_interpret(),
    )(rays, aabb8)
    return out[:n_words]


def cluster_masks_packed(aabb8, o, d, n_clusters: int = None):
    """Bit-packed exact per-ray cluster masks via the Pallas kernel, in the
    kernel-native row-major layout.

    aabb8: [C_pad, 8] f32 (C_pad % 32 == 0; cols lo.xyz, hi.xyz, 2 pad,
    padding rows (BIG, -BIG)). o, d: [N, 3] (flat). Returns
    ([W, Npad] int32, n) with W = C_pad // 32 (<= 8); lanes >= n are zero.
    With n_clusters set, pad-cluster bits (>= n_clusters) are zeroed —
    required wherever the words feed _lex_sort_keys (see _mask_kernel).
    """
    rays, _batch_shape, n = pack_rays(o, d)
    return cluster_masks_rows(aabb8, rays, n_clusters), n


def cluster_masks(aabb8, o, d, n_clusters: int = None):
    """Lane-major [N, W] view of cluster_masks_packed (sort keys, tests)."""
    packed, n = cluster_masks_packed(
        aabb8, o.reshape(-1, 3), d.reshape(-1, 3), n_clusters
    )
    return packed[:, :n].T


# ---------------------------------------------------------------------------
# Host-callable wrappers.
# ---------------------------------------------------------------------------

def pack_rays(o, d):
    """[..., 3] x2 -> ([8, Npad], batch_shape, n). Npad multiple of RB."""
    batch_shape = o.shape[:-1]
    o2 = o.reshape(-1, 3)
    d2 = d.reshape(-1, 3)
    n = o2.shape[0]
    npad = ((n + RB - 1) // RB) * RB
    rays = jnp.zeros((8, npad), jnp.float32)
    rays = rays.at[0:3, :n].set(o2.T)
    rays = rays.at[3:6, :n].set(d2.T)
    # dead padding lanes: unit +x direction far away, hits nothing
    if npad != n:
        rays = rays.at[0, n:].set(BIG)
        rays = rays.at[3, n:].set(1.0)
    return rays, batch_shape, n


def unpack_hits(out, batch_shape, n):
    """Kernel output rows -> (t, idx). Rows 2+ are padding: the kernels
    return only the hit decision; barycentrics are recomputed at shade time
    from the shade_row gather (integrator._point_material)."""
    t = out[0, :n].reshape(batch_shape)
    idx = out[1, :n].reshape(batch_shape).astype(jnp.int32)
    return t, idx


def pad_triangles(tri_p, tri_u, tri_v) -> np.ndarray:
    """Host-side: build the packed kernel triangle array (numpy).

    Width is the streaming contract: VMEM-resident scenes pack [Tpad, 12]
    (VMEM economy); scenes above the streaming threshold pack [Tpad, 128]
    because Mosaic requires HBM slices to be 128-lane aligned — a DMA of a
    (LEAF, 12) window out of a 12-wide array is an invalid misaligned
    slice (Mosaic tiles the 12-wide array to 128 lanes physically anyway,
    so the wide layout costs no extra HBM). `_culled_call` streams iff the
    array is 128 wide, so build-time and call-time can never disagree.
    """
    t = np.asarray(tri_p).shape[0]
    tpad = max(((t + LEAF - 1) // LEAF) * LEAF, LEAF)
    ncols = 128 if tpad > _stream_threshold() else 12
    arr = np.zeros((tpad, ncols), np.float32)
    arr[:t, 0:3] = np.asarray(tri_p)
    arr[:t, 3:6] = np.asarray(tri_u)
    arr[:t, 6:9] = np.asarray(tri_v)
    arr[t:, 0:3] = BIG  # degenerate far-away padding rows
    return arr


def _interpret() -> bool:
    # CPU backend: run the kernels through the Pallas interpreter (tests).
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _brute_call(rays, tris, n_clusters: int):
    npad = rays.shape[1]
    grid = (npad // RB,)
    return pl.pallas_call(
        functools.partial(_brute_kernel, n_clusters=n_clusters),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tris.shape[0], tris.shape[1]), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((8, RB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=_interpret(),
    )(rays, tris)


def intersect_brute(scene_tris, o, d):
    """Nearest hit of rays against the packed triangle array.

    scene_tris: [Tpad, 12] (device array). Returns (t, idx, bu, bv) with
    idx into the packed (BVH-permuted) order, -1 for miss; t WITHOUT the
    RAY_EPS handling (callers of cast_rays semantics add it).
    """
    rays, batch_shape, n = pack_rays(o, d)
    out = _brute_call(rays, scene_tris, scene_tris.shape[0] // LEAF)
    t, idx = unpack_hits(out, batch_shape, n)
    zero = jnp.zeros_like(t)
    return t, idx, zero, zero


# Per-sweep-call VMEM triangle budget (lane padding makes a resident row
# cost 512 B of VMEM; the culled call raises Mosaic's scoped-VMEM limit
# above its 16 MB default when needed — 96k rows ~ 49 MB of the v5e's
# 128 MB). Scenes above this are swept in resident CHUNKS
# (traverse._sweep_exact): k back-to-back kernel calls over [chunk]
# triangle slices combined by min-t — measured far cheaper than
# DMA-streaming per cluster, whose 128-wide rows move ~10.7x the useful
# bytes (city 1080p: 5.67 Mrays/s streamed vs 9.17 in 24k-tri chunks).
# Streaming remains the fallback above RT_TPU_STREAM_TRIS (default 8
# chunks), where per-chunk fixed costs would pile up. 24k measured best
# on the 51.8k-tri city: 9.17 Mrays/s in 3 chunks vs 6.3 as ONE resident
# 26 MB call (scoped-VMEM limit raised) — the whole-scene call is
# strictly slower despite identical per-block list work; chunk slices
# keep each call's triangle block comfortably inside default VMEM
# scheduling.
VMEM_RESIDENT_TRIS = 24 * 1024


def chunk_tris() -> int:
    import os

    return int(os.environ.get("RT_TPU_CHUNK_TRIS", VMEM_RESIDENT_TRIS))


def _stream_threshold() -> int:
    import os

    return int(os.environ.get("RT_TPU_STREAM_TRIS", 8 * VMEM_RESIDENT_TRIS))


def _culled_call(counts, lists, rays, tris):
    npad = rays.shape[1]
    n_clusters = tris.shape[0] // LEAF
    # Streaming is a property of the packed layout (see pad_triangles):
    # 128-wide rows live in HBM and are DMA'd per cluster; 12-wide rows
    # are VMEM-resident.
    stream = tris.shape[1] == 128
    tris_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if stream else pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npad // RB,),
        in_specs=[
            # index maps receive (grid idx, *scalar_prefetch_refs)
            pl.BlockSpec((8, RB), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            tris_spec,
        ],
        out_specs=pl.BlockSpec(
            (8, RB), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((2, LEAF, tris.shape[1]), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if stream
            else []
        ),
    )
    kernel = (
        functools.partial(_culled_stream_kernel, n_clusters=n_clusters)
        if stream
        else functools.partial(_culled_kernel, n_clusters=n_clusters)
    )
    kwargs = {}
    if not stream and not _interpret():
        # Mosaic's default scoped-VMEM limit is 16 MB; a resident triangle
        # array costs rows x 512 B (12-wide rows are lane-padded to 128).
        # Raising the per-kernel limit admits chunk sizes beyond ~28k rows
        # (RT_TPU_CHUNK_TRIS experiments); measured on city, one 26 MB
        # whole-scene call is SLOWER than 3 default-VMEM chunks, so this
        # engages only when the triangles alone exceed the default limit.
        need = tris.shape[0] * 512 + (6 << 20)
        if tris.shape[0] * 512 > (15 << 20):
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=min(int(need), 110 << 20)
            )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=_interpret(),
        **kwargs,
    )(counts, lists, rays, tris)


# Scalar-prefetch arrays live in SMEM (~1 MB); bound the per-call block
# count so counts+lists fit, and loop over super-chunks of rays.
SMEM_BUDGET_BYTES = 700_000


def _smem_cols(c: int) -> int:
    """SMEM allocation width of a [rows, c] scalar-prefetch array: the
    minor dim is lane-padded to a 128 multiple (measured: a [2720, 55] i32
    lists array allocates 2720 x 128 x 4 = 1,392,640 bytes and crashes the
    1 MB SMEM — budget math on the logical width under-counts ~2.3x)."""
    return -(-c // 128) * 128


def list_block(scene_tris) -> int:
    """Lane granularity of the cluster lists for this packed layout: RB_SUB
    for VMEM-resident sweeps (tighter unions, same kernel grid), RB for
    DMA-streamed scenes (the stream kernel issues one DMA per list entry
    per block — sub-lists would multiply the DMA count ~4x for overlapping
    cluster sets)."""
    return RB if scene_tris.shape[1] == 128 else RB_SUB


def intersect_culled_rows(scene_tris, counts, lists, rays):
    """intersect_culled for rays already packed as [8, Npad] rows (with the
    RAY_EPS offset applied by the caller). Returns the kernel-native
    [8, Npad] output rows (t, tri_index-as-f32, 6 pad)."""
    npad = rays.shape[1]
    nb = npad // RB
    sub = RB // list_block(scene_tris)  # list rows per kernel block
    c = lists.shape[1]
    max_blocks = max(
        64, SMEM_BUDGET_BYTES // (4 * (_smem_cols(c) + 1) * sub)
    )
    if nb <= max_blocks:
        return _culled_call(counts, lists, rays, scene_tris)
    n_chunks = -(-nb // max_blocks)
    per = -(-nb // n_chunks)  # balanced chunk size (kernel blocks)
    pieces = []
    for s in range(0, nb, per):
        e = min(nb, s + per)
        pieces.append(
            _culled_call(
                counts[s * sub:e * sub], lists[s * sub:e * sub],
                jax.lax.slice_in_dim(rays, s * RB, e * RB, axis=1),
                scene_tris,
            )
        )
    return jnp.concatenate(pieces, axis=1)


def intersect_culled(scene_tris, counts, lists, o, d):
    """Nearest hit testing only the per-sub-block cluster lists
    (ops/culling.py, built at list_block(scene_tris) lane granularity).

    counts: [NSB] i32; lists: [NSB, C] i32 (entries beyond counts ignored).
    """
    rays, batch_shape, n = pack_rays(o, d)
    out = intersect_culled_rows(scene_tris, counts, lists, rays)
    t, idx = unpack_hits(out, batch_shape, n)
    zero = jnp.zeros_like(t)
    return t, idx, zero, zero
