"""Accumulator checkpoint / resume.

The reference never serializes its resumable accumulation state
(SURVEY.md section 5 calls this out as a cheap win); here continuous renders
survive restarts: the Stats pytree + render metadata round-trip through one
.npz file. `--resume` in the CLI picks it up.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from raytracer_odin_tpu.render import accum

FORMAT_VERSION = 1


def save(path, stats: accum.Stats, samples_done: int, meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        first=np.asarray(stats.first),
        last=np.asarray(stats.last),
        total=np.asarray(stats.total),
        total_sq=np.asarray(stats.total_sq),
        count=np.asarray(stats.count),
        meta=json.dumps(
            {"version": FORMAT_VERSION, "samples_done": samples_done, **(meta or {})}
        ),
    )


def load(path):
    """Returns (stats, samples_done, meta)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta.get("version") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version: {meta.get('version')}")
    stats = accum.Stats(
        first=jnp.asarray(z["first"]),
        last=jnp.asarray(z["last"]),
        total=jnp.asarray(z["total"]),
        total_sq=jnp.asarray(z["total_sq"]),
        count=jnp.asarray(z["count"]),
    )
    return stats, int(meta["samples_done"]), meta


def exists(path) -> bool:
    return Path(path).exists()
