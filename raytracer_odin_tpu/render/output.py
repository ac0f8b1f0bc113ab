"""Statistics -> displayable RGB: the 8 diagnostic view modes, ACES tone
mapping and gamma (output.odin:10-80).

Modes (Output_Mode, output.odin:10-19): mean, variance, first, last, count,
weight (stub in the reference, kept as zeros), hash, naninf.
"""

from __future__ import annotations

import numpy as np

MODES = ("mean", "variance", "first", "last", "count", "weight", "hash", "naninf")


def tone_map_aces(x: np.ndarray) -> np.ndarray:
    """ACES filmic curve (output.odin:21-28)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def layer_to_rgb(stats, layer: int = 0, mode: str = "mean") -> np.ndarray:
    """Convert one accumulator layer to uint8 RGB (get_rgb_image,
    output.odin:30-80). `stats` fields may be jnp or np arrays."""
    first = np.asarray(stats.first[layer])
    last = np.asarray(stats.last[layer])
    total = np.asarray(stats.total[layer])
    total_sq = np.asarray(stats.total_sq[layer])
    count = np.asarray(stats.count[layer])[..., None]

    with np.errstate(divide="ignore", invalid="ignore"):
        if mode == "mean":
            raw = total / count
        elif mode == "variance":
            raw = total_sq / count - (total / count) ** 2
        elif mode == "first":
            raw = first
        elif mode == "last":
            raw = last
        elif mode == "count":
            c = count[..., 0]
            raw = np.stack([c, c / 10.0, c / 100.0], axis=-1)
        elif mode == "weight":
            raw = np.zeros_like(total)  # stub, like output.odin:44-51
        elif mode == "hash":
            reprs = total.astype(np.float32).view(np.uint32)
            h = (reprs * np.uint32(87334379)) & np.uint32(0xFF)
            raw = 1.0 + h.astype(np.float32) / 256.0
        elif mode == "naninf":
            mean = total / count
            raw = tone_map_aces(np.nan_to_num(mean, nan=0.0)) / 10.0
            raw = raw.copy()
            raw[..., 0] = np.where(np.isnan(total[..., 0]), 100.0, raw[..., 0])
            raw[..., 1] = np.where(np.isinf(total[..., 1]), 100.0, raw[..., 1])
        else:
            raise ValueError(f"unknown output mode: {mode}")

    raw = np.maximum(np.nan_to_num(raw, nan=0.0), 0.0)
    big = ~np.isfinite(raw)
    mapped = np.where(big, 1.0, tone_map_aces(np.where(big, 0.0, raw)))
    gamma = np.power(mapped, 1.0 / 2.2)
    return np.clip(np.round(gamma * 255.0), 0, 255).astype(np.uint8)
