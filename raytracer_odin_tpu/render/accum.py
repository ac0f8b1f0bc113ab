"""Per-pixel sample statistics.

The reference accumulates, per pixel and per layer: first sample, sample
count, last sample, running total and total of squares (Sample_Stats,
main.odin:34-40, updated in rc_set_pixel main.odin:89-102). Here the whole
statistics block is a pytree of [L, H, W, ...] arrays living in device HBM
across the entire render — the TPU equivalent of the shared-memory
accumulator, with the benign data race replaced by functional updates.

Layer 0 is the beauty render; layers 1..9 are AOVs (config.py LAYER_*),
populated when debug_features is on, mirroring the reference's 10 debug
layers (NUM_LAYERS, main.odin:48).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class Stats:
    first: Any          # [L, H, W, 3]
    last: Any           # [L, H, W, 3]
    total: Any          # [L, H, W, 3]
    total_sq: Any       # [L, H, W, 3]
    count: Any          # [L, H, W]


def _register(cls):
    names = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda s: ([getattr(s, n) for n in names], None),
        lambda _, c: cls(**dict(zip(names, c))),
    )
    return cls


_register(Stats)


def init_stats(num_layers: int, height: int, width: int) -> Stats:
    def z3():
        # Distinct buffers: aliased fields would break jit donation.
        return jnp.zeros((num_layers, height, width, 3), jnp.float32)

    return Stats(
        first=z3(),
        last=z3(),
        total=z3(),
        total_sq=z3(),
        count=jnp.zeros((num_layers, height, width), jnp.float32),
    )


def crop(stats: Stats, height: int, width: int) -> Stats:
    """Drop internal padding rows/cols (sharded renders pad the image so
    rows divide the tile axis; the user-visible resolution never changes)."""
    if stats.count.shape[1] == height and stats.count.shape[2] == width:
        return stats
    return Stats(
        first=stats.first[:, :height, :width],
        last=stats.last[:, :height, :width],
        total=stats.total[:, :height, :width],
        total_sq=stats.total_sq[:, :height, :width],
        count=stats.count[:, :height, :width],
    )


def pad_rows(stats: Stats, height_pad: int) -> Stats:
    """Zero-pad rows up to height_pad (inverse of crop for resume)."""
    h = stats.count.shape[1]
    if h == height_pad:
        return stats
    w4 = ((0, 0), (0, height_pad - h), (0, 0), (0, 0))
    return Stats(
        first=jnp.pad(stats.first, w4),
        last=jnp.pad(stats.last, w4),
        total=jnp.pad(stats.total, w4),
        total_sq=jnp.pad(stats.total_sq, w4),
        count=jnp.pad(stats.count, w4[:3]),
    )


def update_layers(stats: Stats, vals) -> Stats:
    """Record one sample per pixel on layers [0, L) at once (rc_set_pixel
    semantics per layer, main.odin:89-102). vals: [L, H, W, 3] with
    L <= stats layer count; trailing layers are untouched."""
    L = vals.shape[0]
    is_first = (stats.count[:L] == 0)[..., None]
    return Stats(
        first=stats.first.at[:L].set(
            jnp.where(is_first, vals, stats.first[:L])
        ),
        last=stats.last.at[:L].set(vals),
        total=stats.total.at[:L].add(vals),
        total_sq=stats.total_sq.at[:L].add(vals * vals),
        count=stats.count.at[:L].add(1.0),
    )


def update_layer(stats: Stats, layer: int, color) -> Stats:
    """Record one sample per pixel on `layer` (rc_set_pixel semantics,
    main.odin:89-102). color: [H, W, 3]."""
    count = stats.count[layer]
    is_first = (count == 0)[..., None]
    return Stats(
        first=stats.first.at[layer].set(
            jnp.where(is_first, color, stats.first[layer])
        ),
        last=stats.last.at[layer].set(color),
        total=stats.total.at[layer].add(color),
        total_sq=stats.total_sq.at[layer].add(color * color),
        count=stats.count.at[layer].add(1.0),
    )
