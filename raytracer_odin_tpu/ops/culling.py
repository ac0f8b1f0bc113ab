"""Ray-bundle cluster culling (phase 1 of the TPU intersector).

The hierarchy step of classic per-ray BVH traversal is recast as dense math
over *coherent ray bundles*: rays are grouped into blocks of RB
(pallas_intersect.RB) and each block's conservative interval bound —
origin box + per-axis direction interval — is slab-tested against every
triangle-cluster AABB. Interval arithmetic makes the test conservative:
a cluster is never culled if any ray in the bundle's bounds could hit it
(the bundle analogue of check_intersect_ray_aabb, raytracer.odin:119-133).

Output: per-block cluster lists (ids + counts) consumed by the Pallas
culled-intersect kernel via scalar prefetch. Everything here is dense
[NB, C] elementwise work — no gathers, no divergence; NB*C is tiny.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from raytracer_odin_tpu.ops.pallas_intersect import BIG, LEAF, RB


def cluster_aabbs(tri_lo: np.ndarray, tri_hi: np.ndarray) -> tuple:
    """Host-side: AABBs of consecutive LEAF-sized triangle clusters (in
    BVH/perm order, so clusters are spatially tight treelets).
    Returns (lo [C, 3], hi [C, 3]) with padding clusters collapsed to an
    unhittable box."""
    t = tri_lo.shape[0]
    c = max((t + LEAF - 1) // LEAF, 1)
    lo = np.full((c * LEAF, 3), BIG, np.float32)
    hi = np.full((c * LEAF, 3), -BIG, np.float32)
    lo[:t] = tri_lo
    hi[:t] = tri_hi
    return (
        lo.reshape(c, LEAF, 3).min(axis=1),
        hi.reshape(c, LEAF, 3).max(axis=1),
    )


def block_bounds(o, d, block: int = RB):
    """Per-block bounds. o, d: [Npad, 3] (Npad % block == 0, tile-ordered).
    Returns (o_lo, o_hi, d_lo, d_hi): [NB, 3] each."""
    nb = o.shape[0] // block
    ob = o.reshape(nb, block, 3)
    db = d.reshape(nb, block, 3)
    return ob.min(1), ob.max(1), db.min(1), db.max(1)


def block_bounds_rows(rays, block: int = RB):
    """block_bounds for rays already packed as [8, Npad] kernel rows
    (rows 0-2 = origin, 3-5 = direction): the per-block min/max reduces run
    on the row layout directly instead of paying an [N, 3] transpose."""
    nb = rays.shape[1] // block
    o = rays[0:3].reshape(3, nb, block)
    d = rays[3:6].reshape(3, nb, block)
    return (
        o.min(axis=2).T, o.max(axis=2).T,
        d.min(axis=2).T, d.max(axis=2).T,
    )


def cull_clusters(o_lo, o_hi, d_lo, d_hi, clo, chi):
    """Conservative bundle-vs-AABB test. Returns hit mask [NB, C].

    Per axis: the loosest entry over the (origin x direction) intervals and
    the loosest exit; direction intervals straddling zero leave the axis
    unconstrained. Hit iff max(entry) <= min(exit) and exit >= 0.
    """
    # [NB, 1, 3] vs [1, C, 3]
    o_lo = o_lo[:, None]
    o_hi = o_hi[:, None]
    d_lo = d_lo[:, None]
    d_hi = d_hi[:, None]
    clo = clo[None]
    chi = chi[None]

    # <=/>=: direction intervals *touching* zero (axis-parallel rays) must
    # also leave the axis unconstrained, else inf*0 NaNs could cull a
    # hittable cluster.
    straddle = (d_lo <= 0) & (d_hi >= 0)
    # IEEE division handles zero endpoints (-> +/-inf); straddling intervals
    # are overridden below anyway.
    inv_a = 1.0 / d_lo
    inv_b = 1.0 / d_hi
    inv_lo = jnp.minimum(inv_a, inv_b)
    inv_hi = jnp.maximum(inv_a, inv_b)

    # slab offsets: s1 = clo - o in [clo - o_hi, clo - o_lo]
    s1_lo = clo - o_hi
    s1_hi = clo - o_lo
    s2_lo = chi - o_hi
    s2_hi = chi - o_lo

    def imul(a_lo, a_hi, b_lo, b_hi):
        p1 = a_lo * b_lo
        p2 = a_lo * b_hi
        p3 = a_hi * b_lo
        p4 = a_hi * b_hi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    t1_lo, t1_hi = imul(s1_lo, s1_hi, inv_lo, inv_hi)
    t2_lo, t2_hi = imul(s2_lo, s2_hi, inv_lo, inv_hi)
    entry_lo = jnp.minimum(t1_lo, t2_lo)
    exit_hi = jnp.maximum(t1_hi, t2_hi)
    entry_lo = jnp.where(straddle, -BIG, entry_lo)
    exit_hi = jnp.where(straddle, BIG, exit_hi)

    near = jnp.max(entry_lo, axis=-1)
    far = jnp.min(exit_hi, axis=-1)
    hit = (near <= far) & (far >= 0)

    # Axis-parallel bundles (the whole direction interval is exactly zero)
    # never move on that axis, so the slab constraint reduces to
    # origin-interval overlap — without this, e.g. straight-down light
    # bundles over a city cull nothing (every axis straddles).
    para = (d_lo == 0) & (d_hi == 0)
    overlap = (o_hi >= clo) & (o_lo <= chi)
    hit = hit & jnp.all(jnp.where(para, overlap, True), axis=-1)
    return hit, jnp.maximum(near, 0.0)


def ray_cluster_masks(o, d, clo, chi):
    """Exact per-ray cluster visibility, bit-packed.

    o, d: [N, 3] rays (origins already RAY_EPS-offset; dead lanes should be
    degenerate far rays so their masks come out empty). clo/chi: [C, 3]
    cluster AABBs. Returns [N, W] int32 words, W = ceil(C / 32): bit c of
    word c//32 set iff ray could hit cluster c (slab test, no t bound).

    This is the per-ray replacement of the *bundle interval* cull
    (cull_clusters): ORing the masks over each RB block yields the exact
    union work list instead of a conservative superset — the cluster-major
    exactness of per-ray BVH traversal (raytracer.odin:371-414) recovered
    as dense vector math.
    """
    c = clo.shape[0]
    w = (c + 31) // 32
    pad = w * 32 - c
    if pad:
        clo = jnp.concatenate(
            [clo, jnp.full((pad, 3), BIG, clo.dtype)], axis=0
        )
        chi = jnp.concatenate(
            [chi, jnp.full((pad, 3), -BIG, chi.dtype)], axis=0
        )
    inv = 1.0 / d  # [N, 3]; IEEE infs for axis-parallel handled below

    # [N, 1, 3] vs [1, 32C', 3] -> chunk over words to bound intermediates.
    def word(ws):
        lo = clo[ws * 32:(ws + 1) * 32]
        hi = chi[ws * 32:(ws + 1) * 32]
        t1 = (lo[None] - o[:, None]) * inv[:, None]
        t2 = (hi[None] - o[:, None]) * inv[:, None]
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        # 0 * inf -> NaN (origin on slab plane): axis unconstrained
        tmin = jnp.where(jnp.isnan(tmin), -BIG, tmin)
        tmax = jnp.where(jnp.isnan(tmax), BIG, tmax)
        near = jnp.max(tmin, axis=-1)
        far = jnp.min(tmax, axis=-1)
        hit = (near <= far) & (far >= 0)  # [N, 32]
        bits = jnp.left_shift(
            jnp.int32(1), jnp.arange(32, dtype=jnp.int32)
        )
        return jnp.sum(jnp.where(hit, bits, 0), axis=-1, dtype=jnp.int32)

    return jnp.stack([word(ws) for ws in range(w)], axis=-1)


def or_blocks(words, block: int = RB):
    """[Npad, W] -> per-block OR [NB, W]."""
    nb = words.shape[0] // block
    return jax.lax.reduce(
        words.reshape(nb, block, words.shape[-1]),
        jnp.int32(0),
        jax.lax.bitwise_or,
        (1,),
    )


def or_blocks_packed(words, block: int = RB):
    """Row-major [W, Npad] (cluster_masks_packed layout) -> per-block OR
    [NB, W]."""
    w, npad = words.shape
    return jax.lax.reduce(
        words.reshape(w, npad // block, block),
        jnp.int32(0),
        jax.lax.bitwise_or,
        (2,),
    ).T


def unpack_mask(words, c: int):
    """[NB, W] int32 -> [NB, C] bool."""
    idx = jnp.arange(c, dtype=jnp.int32)
    w = words[:, idx // 32]
    return (jnp.right_shift(w, idx % 32) & 1).astype(bool)


def build_lists(hit_mask, cap: int | None = None, near=None):
    """[NB, C] bool -> (counts [NB] i32, lists [NB, min(C, cap)] i32): hit
    cluster ids packed to the front of each row. With `near` [NB, C]
    (bundle entry distances from cull_clusters), hit ids are ordered
    nearest-first so the kernel's best-t early-out fires sooner.

    With `cap`, rows hitting more than cap clusters get count = -1 (overflow
    sentinel): the kernel then sweeps ALL clusters for that block — correct,
    just unculled. Capping bounds the SMEM footprint of scalar prefetch for
    large scenes.
    """
    nb, c = hit_mask.shape
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None], (nb, c))
    # Sort ids along the cluster axis directly as a sort payload — the
    # argsort + take_along_axis formulation lowered to a ~2 GB/s gather
    # (measured 3.4 ms/bounce); the variadic sort is ~10x cheaper.
    if near is None:
        key = jnp.where(hit_mask, ids, c + ids)
    else:
        key = jnp.where(hit_mask, near, jnp.float32(BIG))
    _, lists = jax.lax.sort((key, ids), num_keys=1, dimension=-1)
    counts = jnp.sum(hit_mask, axis=-1).astype(jnp.int32)
    if cap is not None and cap < c:
        counts = jnp.where(counts > cap, -1, counts)
        lists = lists[:, :cap]
    return counts, lists


def coherence_keys(o, d, alive, scene_lo, scene_hi):
    """Sort keys grouping rays into coherent bundles for bundle culling:
    (dead last) | direction octant | origin morton cell | direction cell.
    Used when the scene is too large for exact mask grouping (the exact
    path sorts lexicographically by (dead|octant, mask words) instead).

    The TPU replacement for per-ray traversal order: instead of each ray
    walking its own near-first tree order (raytracer.odin:396-404), rays are
    re-bucketed each bounce so that bundle-level culling stays tight even for
    incoherent secondary rays. Dead lanes sort to the end and are given
    degenerate rays by the caller, so their bundles cull everything.
    """
    ext = jnp.maximum(scene_hi - scene_lo, 1e-6)
    cell = jnp.clip(((o - scene_lo) / ext * 8.0).astype(jnp.int32), 0, 7)
    # 3-bit interleave (morton) over the 8x8x8 origin grid
    def spread3(x):
        x = (x | (x << 8)) & 0x0300F
        x = (x | (x << 4)) & 0x030C3
        x = (x | (x << 2)) & 0x09249
        return x
    morton = (
        spread3(cell[..., 0])
        | (spread3(cell[..., 1]) << 1)
        | (spread3(cell[..., 2]) << 2)
    )
    octant = (
        (d[..., 0] < 0).astype(jnp.int32)
        + 2 * (d[..., 1] < 0).astype(jnp.int32)
        + 4 * (d[..., 2] < 0).astype(jnp.int32)
    )
    # 4-bit direction refinement inside the octant (tighter bundle cones)
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    dq = (
        (ax > 0.35).astype(jnp.int32)
        + 2 * (ax > 0.75).astype(jnp.int32)
        + 4 * (ay > 0.35).astype(jnp.int32)
        + 8 * (ay > 0.75).astype(jnp.int32)
    )
    dead = (~alive).astype(jnp.int32)
    return (dead << 19) | (octant << 16) | (morton << 4) | dq


def tile_shape(h: int, w: int, th: int = 16, tw: int = 32):
    """Padded image shape whose (th x tw) tiling covers [H, W]. Any output
    resolution is first-class (main.odin:199-204 renders arbitrary W x H):
    non-conforming sizes are padded internally with dead rays, never bumped."""
    return -(-h // th) * th, -(-w // tw) * tw


def to_tiles(x, h, w, th=16, tw=32, pad_value=0.0):
    """[..., H, W, k] -> flat tile-major order, padding the image to the
    covering (th x tw) tiling with `pad_value` rows/cols (callers pad ray
    origins with BIG so padding lanes are degenerate far rays)."""
    hp, wp = tile_shape(h, w, th, tw)
    if (hp, wp) != (h, w):
        widths = [(0, 0)] * (x.ndim - 3) + [(0, hp - h), (0, wp - w), (0, 0)]
        x = jnp.pad(x, widths, constant_values=pad_value)
    lead = x.shape[:-3] if x.ndim > 3 else ()
    k = x.shape[-1]
    y = x.reshape(*lead, hp // th, th, wp // tw, tw, k)
    y = jnp.swapaxes(y, -4, -3)  # [..., H/th, W/tw, th, tw, k]
    return y.reshape(*lead, (hp * wp), k)


def from_tiles(x, h, w, th=16, tw=32):
    """Inverse of to_tiles: flat tile-major -> [..., H, W, k], dropping any
    padding rows/cols."""
    hp, wp = tile_shape(h, w, th, tw)
    lead = x.shape[:-2] if x.ndim > 2 else ()
    k = x.shape[-1] if x.ndim >= 2 else 1
    y = x.reshape(*lead, hp // th, wp // tw, th, tw, k)
    y = jnp.swapaxes(y, -4, -3)
    y = y.reshape(*lead, hp, wp, k)
    return y[..., :h, :w, :]
