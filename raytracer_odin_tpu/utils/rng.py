"""Deterministic per-sample RNG.

The reference reseeds its generator with the task id before every tile
(raytracer.odin:551-552) so renders are reproducible for a fixed work
decomposition. The TPU-native equivalent: a single base key per render, with
counter-based derivation — every (sample index, bounce, purpose) gets an
independent stream via `jax.random.fold_in`, so results are deterministic and
independent of how samples are batched across steps or sharded across chips.
"""

from __future__ import annotations

import jax


def render_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(base: jax.Array, sample_index) -> jax.Array:
    """Key for one global spp index (all pixels share the fold; per-pixel
    decorrelation comes from the shape of the draws)."""
    return jax.random.fold_in(base, sample_index)


def bounce_key(skey: jax.Array, bounce: int, purpose: int) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(skey, bounce), purpose)
