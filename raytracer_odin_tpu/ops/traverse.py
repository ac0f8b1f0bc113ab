"""Device-side nearest-hit ray casting.

Two interchangeable intersectors (selected in config; "auto" by scene size):

  * `cast_rays_bvh` — stackless masked traversal of the flattened BVH
    (ops/bvh.py). All rays advance in lockstep through their own node
    chains via per-octant hit/miss links; each step gathers one node AABB
    per ray and (for leaf steps) up to LEAF_SIZE triangle records. This is
    the TPU-native replacement of the reference's 64-deep explicit stack
    walk (cast_ray_through_bvh, raytracer.odin:371-414).

  * `cast_rays_brute` — chunked all-rays x all-triangles sweep
    (cast_ray_through_trigs, raytracer.odin:351-369, vectorized): fully
    regular VPU work with no gathers; the fastest choice for small scenes.

Both reproduce `cast_ray` semantics (raytracer.odin:416-430): origin pushed
forward by RAY_EPS along the direction, nearest hit with `t > 0`, and the
returned t incremented by RAY_EPS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops.bvh import LEAF_SIZE
from raytracer_odin_tpu.ops.geometry import BIG, RAY_EPS, intersect_aabb, intersect_triangle

# Exact per-ray culling works on at most this many mask bits (4 int32
# sort-payload words). Scenes with more clusters get a two-level layout:
# mask bits cover *super-clusters* of g = ceil(C / MAX_EXACT_CLUSTERS)
# consecutive clusters (exact_cull_layout), and surviving supers are
# refined per block by the conservative interval cull — so every scene
# size keeps the exact per-ray sort/cull path and its asymptotics
# (reference analogue: one scale-free BVH walk, raytracer.odin:211-342).
# Env-overridable for experiments: fewer bits = fewer sort-key columns and
# a cheaper mask kernel, at looser (interval-refined) sweep lists.
# Default 256 (8 words), measured on the 811-cluster city at 1080p:
# 9.17 Mrays/s at 128 bits (g=7) -> 11.51 at 256 (g=4) — the two-level
# expansion looseness dominates that scene's sweep (x16.6 overwork at
# g=7 vs x5.8 at exact bits, tools/city_list_stats.py). Scenes with
# C <= 128 clusters (demo, citynight, all BASELINE configs) are
# unaffected (g == 1 either way); C in (128, 256] moves from g=2 to
# exact bits at up to 4 extra sort-key words.
import os as _os

MAX_EXACT_CLUSTERS = int(_os.environ.get("RT_TPU_MAX_EXACT", 256))

# Two-phase t-bounded culling for presorted exact-mask casts (0 = off):
# phase A sweeps each block's K nearest clusters, then every cluster whose
# per-ray slab ENTRY lies beyond the found hit is pruned (any triangle hit
# inside an AABB has t >= the ray's entry distance into it — sound), and
# phase B sweeps the survivors. Trades a second mask-kernel pass + list
# build for fewer sweep pairs.
TWO_PHASE_K = int(_os.environ.get("RT_TPU_TWO_PHASE", 0))


def _ray_octant(d):
    """Octant index from direction signs: bit k set iff d[k] < 0."""
    return (
        (d[..., 0] < 0).astype(jnp.int32)
        + 2 * (d[..., 1] < 0).astype(jnp.int32)
        + 4 * (d[..., 2] < 0).astype(jnp.int32)
    )


def _lex_sort_keys(alive_f, octant, w_ops, n_clusters: int):
    """Lexicographic coherence-sort keys (dead|octant, mask words).

    TPU lax.sort cost is proportional to the total operand count and
    indifferent to num_keys (trace-measured ~1.3 ms per 2M-lane column
    either way), so the one column worth saving is the dead|octant
    header: when the last mask word has >= 5 free top bits (C % 32 <= 27)
    the header rides in those bits and the header column disappears. The
    header sits above every used mask bit, so dead lanes still sort last
    and per-octant grouping still dominates; the polluted bits lie above
    bit C-1 and are ignored by culling.unpack_mask.

    w_ops: list of [N] int32 mask-word columns (row-major word index; take
    them straight off cluster_masks_rows' [W, N] output — a lane-major
    [N, W] intermediate would cost a full-width transpose per bounce).

    PRECONDITION: the words must have bits >= n_clusters zeroed (pass
    n_clusters to pallas_intersect.cluster_masks_rows) — pad-cluster bits
    above the real clusters would swallow the header and break both the
    grouping and dead-lane compaction's alive-prefix invariant.

    Returns (keys, word_slots): sort with num_keys=len(keys); the sorted
    mask words (original word order, header pollution left in place) are
    [sorted_cols[i] for i in word_slots]."""
    used_top = n_clusters - (len(w_ops) - 1) * 32  # bits used in last word
    hdr = ((~alive_f).astype(jnp.int32) << 3) | octant
    w_ops = list(w_ops)
    if used_top <= 27:
        w_last = w_ops[-1] | (hdr << used_top)
        keys = [w_last] + w_ops[:-1]
        word_slots = list(range(1, len(w_ops))) + [0]
        return keys, word_slots
    return [hdr] + w_ops, list(range(1, 1 + len(w_ops)))


def cast_rays_brute(scene, o, d, max_t=None, chunk: int = 512):
    """Nearest hit over all triangles, processed in static chunks via
    lax.scan. Returns (t, tri_idx, bu, bv) with tri_idx = -1 on miss and
    t = +BIG on miss (t already includes the RAY_EPS re-add)."""
    n_tri = scene.tri_p.shape[0]
    o = o + d * RAY_EPS
    batch_shape = o.shape[:-1]

    chunk = min(chunk, max(n_tri, 1))
    n_chunks = (n_tri + chunk - 1) // chunk
    pad = n_chunks * chunk - n_tri

    tri_p = jnp.pad(scene.tri_p, ((0, pad), (0, 0)))
    tri_u = jnp.pad(scene.tri_u, ((0, pad), (0, 0)))
    tri_v = jnp.pad(scene.tri_v, ((0, pad), (0, 0)))
    valid_tri = jnp.pad(jnp.ones(n_tri, bool), (0, pad))

    init = (
        jnp.full(batch_shape, BIG if max_t is None else max_t, jnp.float32),
        jnp.full(batch_shape, -1, jnp.int32),
        jnp.zeros(batch_shape, jnp.float32),
        jnp.zeros(batch_shape, jnp.float32),
    )

    def body(carry, ck):
        best_t, best_i, best_u, best_v = carry
        p, u, v, vmask, base = ck
        # [..., C] tests: broadcast rays against the triangle chunk.
        t, bu, bv, ok = intersect_triangle(
            o[..., None, :], d[..., None, :], p, u, v
        )
        ok = ok & vmask & (t > 0) & (t < best_t[..., None])
        t = jnp.where(ok, t, BIG)
        k = jnp.argmin(t, axis=-1)
        tk = jnp.take_along_axis(t, k[..., None], axis=-1)[..., 0]
        better = tk < best_t
        kexp = k[..., None]
        best_u = jnp.where(
            better, jnp.take_along_axis(bu, kexp, axis=-1)[..., 0], best_u
        )
        best_v = jnp.where(
            better, jnp.take_along_axis(bv, kexp, axis=-1)[..., 0], best_v
        )
        best_i = jnp.where(better, base + k.astype(jnp.int32), best_i)
        best_t = jnp.where(better, tk, best_t)
        return (best_t, best_i, best_u, best_v), None

    chunks = (
        tri_p.reshape(n_chunks, chunk, 3),
        tri_u.reshape(n_chunks, chunk, 3),
        tri_v.reshape(n_chunks, chunk, 3),
        valid_tri.reshape(n_chunks, chunk),
        jnp.arange(n_chunks, dtype=jnp.int32) * chunk,
    )
    (best_t, best_i, best_u, best_v), _ = jax.lax.scan(body, init, chunks)
    best_t = jnp.where(best_i >= 0, best_t + RAY_EPS, BIG)
    return best_t, best_i, best_u, best_v


def cast_rays_bvh(scene, o, d, max_t=None):
    """Stackless masked BVH traversal; same returns as cast_rays_brute."""
    bvh = scene.bvh
    n_nodes = bvh.lo.shape[0]
    o = o + d * RAY_EPS
    batch_shape = o.shape[:-1]
    inv_d = 1.0 / d
    octant = _ray_octant(d)
    # Flatten per-octant links for a single gather with combined index.
    hit_link = bvh.hit_link.reshape(-1)    # [8*B]
    miss_link = bvh.miss_link.reshape(-1)  # [8*B]
    oct_base = octant * n_nodes

    init = (
        jnp.zeros(batch_shape, jnp.int32),  # current node
        jnp.full(batch_shape, BIG if max_t is None else max_t, jnp.float32),
        jnp.full(batch_shape, -1, jnp.int32),
        jnp.zeros(batch_shape, jnp.float32),
        jnp.zeros(batch_shape, jnp.float32),
    )

    def cond(state):
        node = state[0]
        return jnp.any(node < n_nodes)

    def body(state):
        node, best_t, best_i, best_u, best_v = state
        nidx = jnp.minimum(node, n_nodes - 1)  # clamp finished lanes
        active = node < n_nodes
        lo = bvh.lo[nidx]
        hi = bvh.hi[nidx]
        _, box_hit = intersect_aabb(o, inv_d, lo, hi, best_t)
        box_hit = box_hit & active

        first = bvh.first[nidx]
        count = bvh.count[nidx]
        is_leaf = count > 0
        do_tris = box_hit & is_leaf

        # Test the (<= LEAF_SIZE) triangles of leaf nodes; static unroll.
        for k in range(LEAF_SIZE):
            ti = jnp.minimum(first + k, scene.tri_p.shape[0] - 1)
            t, bu, bv, ok = intersect_triangle(
                o, d, scene.tri_p[ti], scene.tri_u[ti], scene.tri_v[ti]
            )
            ok = ok & do_tris & (k < count) & (t > 0) & (t < best_t)
            best_t = jnp.where(ok, t, best_t)
            best_i = jnp.where(ok, ti, best_i)
            best_u = jnp.where(ok, bu, best_u)
            best_v = jnp.where(ok, bv, best_v)

        links_idx = oct_base + nidx
        nxt = jnp.where(box_hit, hit_link[links_idx], miss_link[links_idx])
        node = jnp.where(active, nxt, node)
        return node, best_t, best_i, best_u, best_v

    _, best_t, best_i, best_u, best_v = jax.lax.while_loop(cond, body, init)
    best_t = jnp.where(best_i >= 0, best_t + RAY_EPS, BIG)
    return best_t, best_i, best_u, best_v


def exact_cull_layout(scene):
    """Two-level exact-cull layout: (g, n_super, aabb8).

    g = clusters per mask bit (1 when the scene fits MAX_EXACT_CLUSTERS
    bits directly; ceil(C / MAX_EXACT_CLUSTERS) otherwise). aabb8 is the
    [S_pad, 8] AABB-row array for the exact-mask kernel (lo.xyz, hi.xyz,
    2 pad columns; padded to a multiple of 32 rows with unhittable
    (BIG, -BIG) boxes): row s bounds clusters [s*g, (s+1)*g) — consecutive
    clusters are BVH-ordered treelets, so groups stay spatially tight."""
    n_clusters = scene.cluster_lo.shape[0]
    g = -(-n_clusters // MAX_EXACT_CLUSTERS)
    n_super = -(-n_clusters // g)
    lo, hi = scene.cluster_lo, scene.cluster_hi
    if g > 1:
        pad = n_super * g - n_clusters
        if pad:
            lo = jnp.concatenate(
                [lo, jnp.full((pad, 3), BIG, jnp.float32)], axis=0
            )
            hi = jnp.concatenate(
                [hi, jnp.full((pad, 3), -BIG, jnp.float32)], axis=0
            )
        lo = lo.reshape(n_super, g, 3).min(axis=1)
        hi = hi.reshape(n_super, g, 3).max(axis=1)
    s_pad = -(-n_super // 32) * 32
    aabb8 = jnp.concatenate(
        [lo, hi, jnp.zeros((n_super, 2), jnp.float32)], axis=-1
    )
    pad_rows = jnp.concatenate(
        [
            jnp.full((s_pad - n_super, 3), BIG, jnp.float32),
            jnp.full((s_pad - n_super, 3), -BIG, jnp.float32),
            jnp.zeros((s_pad - n_super, 2), jnp.float32),
        ],
        axis=-1,
    )
    return g, n_super, jnp.concatenate([aabb8, pad_rows], axis=0)


def _sweep_exact(scene, words_packed, rays, g: int, n_super: int,
                 cap: int = 256):
    """Per-block cluster lists from sorted per-ray super masks + the culled
    sweep, at the pallas_intersect.list_block(scene.ptri) lane granularity
    (RB_SUB for VMEM-resident scenes: tighter unions inside an unchanged
    kernel grid). Returns the kernel-native [8, N] output rows.

    words_packed: [W, Npad] int32 row-major masks over n_super bits.
    rays: the matching [8, Npad] kernel rows (RAY_EPS-offset).
    g == 1: the mask bits ARE clusters — OR-union per block, done (exact).
    g > 1: expand each block's surviving super bits to their g member
    clusters and refine with the conservative bundle-interval cull
    (culling.cull_clusters) — the intersection is strictly tighter than
    either level alone, and `near` orders survivors nearest-first.

    Scenes whose triangle array exceeds the per-call VMEM budget
    (pallas_intersect.chunk_tris) but are not DMA-streamed run the sweep in
    resident CHUNKS: one kernel call per [chunk] triangle slice with that
    chunk's lists, combined by strict min-t (ascending chunk order keeps
    the first-wins tie rule of a single id-ordered sweep). This keeps
    mid-size scenes (e.g. the 51.8k-tri city) on the fast resident kernel
    instead of the per-cluster DMA stream whose 128-lane-aligned rows move
    ~10.7x the useful bytes."""
    from raytracer_odin_tpu.ops import culling
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    lb = pi.list_block(scene.ptri)
    n_clusters = scene.cluster_lo.shape[0]
    smask = culling.unpack_mask(
        culling.or_blocks_packed(words_packed, lb), n_super
    )
    near = None
    if g == 1:
        bmask = smask
    else:
        cmask = jnp.repeat(smask, g, axis=1)[:, :n_clusters]
        o_lo, o_hi, d_lo, d_hi = culling.block_bounds_rows(rays, lb)
        imask, near = culling.cull_clusters(
            o_lo, o_hi, d_lo, d_hi, scene.cluster_lo, scene.cluster_hi
        )
        bmask = cmask & imask

    chunk_c = max(1, pi.chunk_tris() // pi.LEAF)
    if scene.ptri.shape[1] == 128 or n_clusters <= chunk_c:
        counts, lists = culling.build_lists(bmask, cap=cap, near=near)
        return pi.intersect_culled_rows(scene.ptri, counts, lists, rays)

    out = None
    for a in range(0, n_clusters, chunk_c):
        b = min(n_clusters, a + chunk_c)
        # Per-chunk lists cover the WHOLE chunk (cap == chunk width), so the
        # count == -1 overflow sentinel is unreachable: no block ever falls
        # back to sweeping the entire chunk. tools/city_list_stats.py named
        # cap-overflow full-chunk sweeps as the city path's dominant wasted
        # work; SMEM stays bounded because intersect_culled_rows splits the
        # call into ray super-chunks from lists.shape[1] (city chunks are
        # 384 clusters -> 385 i32/row, ~227 blocks/call at the 700 kB
        # budget).
        counts, lists = culling.build_lists(
            bmask[:, a:b], cap=None,
            near=None if near is None else near[:, a:b],
        )
        ptri_c = jax.lax.slice_in_dim(
            scene.ptri, a * pi.LEAF, b * pi.LEAF, axis=0
        )
        oc = pi.intersect_culled_rows(ptri_c, counts, lists, rays)
        # rebase the chunk-local triangle index (row 1; misses stay -1)
        idx = oc[1:2]
        oc = jnp.concatenate(
            [oc[0:1], jnp.where(idx >= 0, idx + a * pi.LEAF, idx), oc[2:8]],
            axis=0,
        )
        out = oc if out is None else jnp.where(oc[0:1] < out[0:1], oc, out)
    return out


def _two_phase_exact(scene, rays, words, n_super: int, aabb8, cap: int = 256):
    """Two-phase t-bounded exact culling (TWO_PHASE_K; g == 1 VMEM-resident
    scenes). Phase A sweeps each block's K nearest exact-list clusters;
    phase B re-masks with the per-ray occlusion bound t_A (mask kernel
    tmax row: prune clusters entered beyond the found hit), clears the
    already-swept bits, and sweeps the remainder. Ties keep phase A — the
    nearest-first list order puts A's clusters first, matching the
    single-sweep first-wins rule. Returns the [8, N] kernel output rows."""
    from raytracer_odin_tpu.ops import culling
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    k = TWO_PHASE_K
    lb = pi.list_block(scene.ptri)
    smask = culling.unpack_mask(
        culling.or_blocks_packed(words, lb), n_super
    )
    o_lo, o_hi, d_lo, d_hi = culling.block_bounds_rows(rays, lb)
    _, near = culling.cull_clusters(
        o_lo, o_hi, d_lo, d_hi, scene.cluster_lo, scene.cluster_hi
    )
    counts, lists = culling.build_lists(smask, cap=cap, near=near)

    counts_a = jnp.where(counts < 0, k, jnp.minimum(counts, k))
    out_a = pi.intersect_culled_rows(scene.ptri, counts_a, lists, rays)

    # Per-ray occlusion bound rides ray row 6 into the t-bounded mask pass.
    rays_b = jnp.concatenate([rays[0:6], out_a[0:1], rays[7:8]], axis=0)
    words_b = pi.cluster_masks_rows(aabb8, rays_b, n_super, tmax_row=True)
    # Clear the phase-A-swept clusters (valid for the whole block: phase A
    # tested them for every lane of the block).
    n_words = words_b.shape[0]
    kmax = min(k, lists.shape[1])
    tested_cols = []
    for w in range(n_words):
        tw = jnp.zeros(counts.shape, jnp.int32)
        for kk in range(kmax):
            cid = lists[:, kk]
            use = (kk < counts_a) & (cid // 32 == w)
            tw = tw | jnp.where(
                use, jnp.left_shift(jnp.int32(1), cid % 32), 0
            )
        tested_cols.append(tw)
    tested = jnp.stack(tested_cols, axis=0)  # [W, NB]
    tested_lanes = jnp.repeat(tested, lb, axis=1)
    words_b = words_b & ~tested_lanes
    counts_b, lists_b = culling.build_lists(
        culling.unpack_mask(
            culling.or_blocks_packed(words_b, lb), n_super
        ),
        cap=cap, near=near,
    )
    out_b = pi.intersect_culled_rows(scene.ptri, counts_b, lists_b, rays)
    return jnp.where((out_b[0:1] < out_a[0:1]), out_b, out_a)


def cast_presorted_rows(scene, rays, words=None):
    """cast_presorted for rays already packed as [8, N] kernel rows WITH the
    RAY_EPS offset applied (rows = ox oy oz dx dy dz, 2 pad; N % RB == 0).
    Callers holding per-component columns (the compacted wavefront's sorted
    sort-payload columns) build the rows with one cheap axis-0 stack,
    skipping the [N, 3] -> [8, N] transpose pack_rays would pay.
    Returns (t, idx, bu, bv) flat [N] in the given lane order."""
    from raytracer_odin_tpu.ops import culling
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    n = rays.shape[1]
    if words is not None:
        g, n_super, aabb8 = exact_cull_layout(scene)
        if TWO_PHASE_K > 0 and g == 1 and scene.ptri.shape[1] != 128:
            out = _two_phase_exact(scene, rays, words, n_super, aabb8)
        else:
            out = _sweep_exact(scene, words, rays, g, n_super)
    else:
        lb = pi.list_block(scene.ptri)
        o_lo, o_hi, d_lo, d_hi = culling.block_bounds_rows(rays, lb)
        mask, near = culling.cull_clusters(
            o_lo, o_hi, d_lo, d_hi, scene.cluster_lo, scene.cluster_hi
        )
        counts, lists = culling.build_lists(mask, cap=256, near=near)
        out = pi.intersect_culled_rows(scene.ptri, counts, lists, rays)
    t, idx = pi.unpack_hits(out, (n,), n)
    t = jnp.where(idx >= 0, t + RAY_EPS, BIG)
    # Pallas kernels return only the hit decision; barycentrics are
    # recomputed at shade time (integrator._point_material) from the
    # shade_row gather — the zeros keep the shared 4-tuple cast interface.
    zero = jnp.zeros_like(t)
    return t, idx, zero, zero


def cast_presorted(scene, o, d, words=None):
    """Nearest hit for rays that are ALREADY coherence-sorted and RB-aligned
    (no internal sort, no unsort — results come back in the given lane
    order).

    o, d: [N, 3] with N a multiple of pallas_intersect.RB; dead lanes must
    already carry degenerate far rays. words: [W, N] int32 row-major exact
    per-ray super masks of the RAY_EPS-offset rays (cluster_masks_packed
    layout over exact_cull_layout's bits), or None to use the conservative
    bundle-interval cull. Same cast_ray semantics as every other
    intersector (RAY_EPS offset + re-add, raytracer.odin:416-430)."""
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    o = o + d * RAY_EPS
    rays, _, _ = pi.pack_rays(o, d)
    return cast_presorted_rows(scene, rays, words)


def cast_rays_pallas(scene, o, d, culled: bool = True, sort: bool = False,
                     alive=None):
    """Pallas bundle-culled intersect (ops/pallas_intersect + ops/culling):
    rays grouped into RB-sized bundles; each bundle's conservative interval
    bound culls triangle clusters in dense XLA math, then the Pallas kernel
    sweeps the surviving clusters on the VPU. Same cast_ray semantics as the
    other intersectors (RAY_EPS offset + re-add, raytracer.odin:416-430).

    sort=True re-buckets rays into coherent bundles by
    (alive, octant, origin cell, direction cell) before culling — essential
    for incoherent secondary bounces — and scatters results back to the
    original lane order. Dead lanes (alive=False) are replaced by degenerate
    far-away rays whose bundles cull everything.
    """
    from raytracer_odin_tpu.ops import culling
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    o = o + d * RAY_EPS
    batch_shape = o.shape[:-1]

    n_clusters = scene.cluster_lo.shape[0]
    # Exact per-ray cull (pallas_intersect.cluster_masks): bit-packed masks
    # ride the coherence sort and OR into exact per-block work lists,
    # replacing (small scenes) or refining (two-level, g > 1) the
    # conservative interval cull. exact_cull_layout keeps the bit count
    # within the sort-payload word budget at any scene size.
    exact = culled
    exact_words = None
    if exact:
        g_exact, n_super, aabb8 = exact_cull_layout(scene)

    perm = None
    if sort:
        o2 = o.reshape(-1, 3)
        d2 = d.reshape(-1, 3)
        scene_lo = jnp.min(scene.cluster_lo, axis=0)
        scene_hi = jnp.max(
            jnp.where(scene.cluster_hi > -BIG, scene.cluster_hi, scene_lo),
            axis=0,
        )
        if alive is None:
            alive_f = jnp.ones(o2.shape[0], bool)
        else:
            alive_f = alive.reshape(-1)
            far = scene_hi + 1000.0
            o2 = jnp.where(alive_f[:, None], o2, far)
            d2 = jnp.where(
                alive_f[:, None], d2,
                jnp.asarray([1.0, 0.0, 0.0], d2.dtype),
            )
        # Single variadic sort carrying the ray payload + original position:
        # TPU scatters serialize (measured 83 ms for the 2M unsort scatter),
        # while sorts are ~3 ms — so both directions ride lax.sort.
        n_rays = o2.shape[0]
        iota = jnp.arange(n_rays, dtype=jnp.int32)
        if exact:
            # Exact grouping: lexicographic (dead|octant, mask words) —
            # rays with identical cluster work lists land in the same
            # bundle (measured on demo secondary bounces: mean RB block
            # union 26.4 clusters vs 89.3 unsorted; approximate single-key
            # signatures measured 41.8 — the full lex order earns its
            # keep, and extra key columns are free, see _lex_sort_keys).
            rays_pre, _, _ = pi.pack_rays(o2, d2)
            words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
            w_ops = [words_p[i, :n_rays] for i in range(words_p.shape[0])]
            octant = _ray_octant(d2)
            keys, word_slots = _lex_sort_keys(
                alive_f, octant, w_ops, n_super
            )
            sorted_ops = jax.lax.sort(
                tuple(keys
                      + [o2[:, 0], o2[:, 1], o2[:, 2],
                         d2[:, 0], d2[:, 1], d2[:, 2], iota]),
                num_keys=len(keys),
            )
            exact_words = jnp.stack(
                [sorted_ops[i] for i in word_slots], axis=0
            )
            (ox, oy, oz, dx, dy, dz, perm) = sorted_ops[len(keys):]
        else:
            keys = culling.coherence_keys(
                o2, d2, alive_f, scene_lo, scene_hi
            )
            (_, ox, oy, oz, dx, dy, dz, perm) = jax.lax.sort(
                (keys, o2[:, 0], o2[:, 1], o2[:, 2],
                 d2[:, 0], d2[:, 1], d2[:, 2], iota),
                num_keys=1,
            )
        # Kernel rows straight from the sorted columns: one cheap axis-0
        # stack instead of the [N, 3] stack + transpose pack_rays would pay.
        n = n_rays
        npad = ((n + pi.RB - 1) // pi.RB) * pi.RB
        zero = jnp.zeros_like(ox)
        rays2 = jnp.stack([ox, oy, oz, dx, dy, dz, zero, zero], axis=0)
        if npad != n:
            # padding lanes: degenerate far rays (hit nothing; their
            # interval bounds only widen blocks conservatively)
            rays2 = jnp.pad(rays2, ((0, 0), (0, npad - n)))
            rays2 = rays2.at[0, n:].set(BIG).at[3, n:].set(1.0)
        tiled = False
    else:
        tiled = len(batch_shape) == 2
        if tiled:
            h, w = batch_shape
            # padding lanes: far origins + null directions = dead rays
            o2 = culling.to_tiles(o, h, w, pad_value=BIG)
            d2 = culling.to_tiles(d, h, w, pad_value=0.0)
        else:
            o2 = o.reshape(-1, 3)
            d2 = d.reshape(-1, 3)
        # One shared row pack for the mask kernel AND the sweep kernel.
        rays2, _, n = pi.pack_rays(o2, d2)
        npad = rays2.shape[1]
        if exact:
            exact_words = pi.cluster_masks_rows(aabb8, rays2, n_super)

    if culled and exact:
        # Exact per-block lists: OR-union of the block's per-ray masks
        # (g > 1: super bits expanded to member clusters and refined by
        # the interval cull — see _sweep_exact). The kernel sweeps its
        # list branch-free, so visit order is irrelevant at g == 1.
        w_p = exact_words
        if w_p.shape[1] != npad:
            w_p = jnp.pad(w_p, ((0, 0), (0, npad - w_p.shape[1])))
        out = _sweep_exact(scene, w_p, rays2, g_exact, n_super)
        t, idx = pi.unpack_hits(out, (n,), n)
    elif culled:
        o_lo, o_hi, d_lo, d_hi = culling.block_bounds_rows(
            rays2, pi.list_block(scene.ptri)
        )
        # Conservative bundle-interval cull for scenes whose mask exceeds
        # the exact-path word budget; `near` orders lists nearest-first
        # (harmless now that the kernel has no early-out).
        mask, near = culling.cull_clusters(
            o_lo, o_hi, d_lo, d_hi, scene.cluster_lo, scene.cluster_hi
        )
        # Capped list length bounds the SMEM footprint of scalar prefetch —
        # rare overflow blocks sweep all clusters inside the kernel
        # (correct, just unculled).
        counts, lists = culling.build_lists(mask, cap=256, near=near)
        out = pi.intersect_culled_rows(scene.ptri, counts, lists, rays2)
        t, idx = pi.unpack_hits(out, (n,), n)
    else:
        t, idx, _, _ = pi.intersect_brute(scene.ptri, o2, d2)

    if perm is not None:
        # restore original lane order: sort by the carried source positions
        # (perm is a permutation of iota, so this is an exact inverse)
        (_, t, idx) = jax.lax.sort((perm, t, idx), num_keys=1)
        t = t.reshape(batch_shape)
        idx = idx.reshape(batch_shape)
    elif tiled:
        h, w = batch_shape
        t = culling.from_tiles(t[:, None], h, w)[..., 0]
        idx = culling.from_tiles(idx[:, None], h, w)[..., 0]
    else:
        t = t.reshape(batch_shape)
        idx = idx.reshape(batch_shape)

    t = jnp.where(idx >= 0, t + RAY_EPS, BIG)
    # Barycentrics are recomputed at shade time from the shade_row gather
    # (integrator._point_material); the zeros keep the 4-tuple interface.
    zero = jnp.zeros_like(t)
    return t, idx, zero, zero


def cast_rays(scene, o, d, *, intersector: str = "auto", brute_chunk: int = 512,
              brute_max_tris: int = 512, sort: bool = False, alive=None):
    """Dispatch between intersectors (static decision at trace time).

    "auto" is backend-aware: on TPU the per-lane-gather BVH walk gets
    scalarized by XLA (measured ~0.1 Mrays/s and minutes of compile), so TPU
    uses the Pallas bundle-culled kernel; CPU uses the BVH walk for big
    scenes (where it vectorizes fine) and the dense sweep for tiny ones.
    sort/alive are honored by the Pallas path (coherent re-bucketing of
    secondary rays); other intersectors are order-insensitive.
    """
    n_tri = scene.tri_p.shape[0]
    if intersector == "auto":
        if jax.default_backend() == "cpu":
            intersector = "brute" if n_tri <= brute_max_tris else "bvh"
        else:
            intersector = "pallas"
    if intersector == "pallas":
        return cast_rays_pallas(scene, o, d, culled=True, sort=sort, alive=alive)
    if intersector == "pallas_brute":
        return cast_rays_pallas(scene, o, d, culled=False)
    if intersector == "brute":
        return cast_rays_brute(scene, o, d, chunk=brute_chunk)
    return cast_rays_bvh(scene, o, d)
