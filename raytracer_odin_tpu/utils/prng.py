"""Counter-based per-lane uniforms via the PCG4D hash.

The integrator draws a handful of uniforms per (pixel, sample, bounce)
lane. jax.random's threefry is a full 20-round block cipher — measured as a
visible slice of the per-bounce elementwise cost at 2M lanes — while a
statistically-solid rendering hash needs an order of magnitude fewer ops.
This module keeps the *key derivation* on jax.random (scalar fold_in chains,
one per step/bounce, preserving the public seeding semantics) and replaces
only the per-lane draw with PCG4D (Jarzynski & Olano, "Hash Functions for
GPU Rendering", JCGT 2020): 4 lanes of LCG + 2 rounds of cross-feedback and
an xorshift.

Determinism contract (unchanged from the threefry version): every draw is a
pure function of (seed, sample, bounce-tag, stream id, draw index), so
renders are invariant under any batching, sharding, or lane permutation —
the TPU analogue of the reference's per-task reseeding
(raytracer.odin:552).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def key_words(key):
    """Two scalar uint32 words from a jax PRNG key (legacy uint32[2] or
    typed)."""
    data = jax.random.key_data(key)
    return data[..., 0].astype(_U32), data[..., 1].astype(_U32)


def _pcg4d(a, b, c, d):
    """PCG4D mix of four uint32 streams -> four decorrelated uint32."""
    a = a * _U32(1664525) + _U32(1013904223)
    b = b * _U32(1664525) + _U32(1013904223)
    c = c * _U32(1664525) + _U32(1013904223)
    d = d * _U32(1664525) + _U32(1013904223)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit(w):
    """uint32 -> f32 in [0, 1) using the top 24 bits."""
    return (w >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _blocks(a, b, c, n: int):
    """Stack ceil(n/4) PCG4D blocks over the 4th counter slot -> [..., n]."""
    outs = []
    for blk in range((n + 3) // 4):
        outs.extend(_pcg4d(a, b, c, jnp.full_like(a, _U32(blk))))
    return jnp.stack([_to_unit(w) for w in outs[:n]], axis=-1)


# Tag for the camera-jitter draw (distinct from bounce tags 0..depth-1).
JITTER_TAG = 0x7E11


def uniforms_cols(key, samples, tags, sids, n: int):
    """Tuple-of-columns form of `uniforms` (identical draws, no final
    stack): the columnar shade stage (ops/shading_cols.py) consumes the n
    uniforms as separate [N] columns, so materializing the [..., n] array
    would only add a relayout."""
    k0, k1 = key_words(key)
    cast = lambda x: jnp.asarray(x).astype(_U32)  # noqa: E731
    a = cast(samples) ^ k0
    b = cast(tags) ^ k1
    c = cast(sids)
    outs = []
    for blk in range((n + 3) // 4):
        outs.extend(_pcg4d(a, b, c, jnp.full_like(c, _U32(blk))))
    return tuple(_to_unit(w) for w in outs[:n])


def uniforms(key, samples, tags, sids, n: int):
    """[..., n] uniforms addressed by (sample, tag, stream-id) counters
    under the scalar base `key`.

    `samples`/`tags`/`sids` may be python ints, traced scalars, or arrays
    (broadcast together): the batched integrator passes a scalar sample and
    bounce tag with per-pixel sids; the wavefront pool passes all three per
    lane. Identical counters => identical draws, which is what makes the
    pool bit-match the batched path and renders invariant under sharding.
    """
    k0, k1 = key_words(key)
    cast = lambda x: jnp.asarray(x).astype(_U32)  # noqa: E731
    return _blocks(
        cast(samples) ^ k0,
        cast(tags) ^ k1,
        cast(sids),
        n,
    )
