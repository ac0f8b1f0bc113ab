"""Columnar 3-vector math: vectors as tuples of [N] component columns.

Why this exists (r5, measured): f32 arrays shaped [N, 3] tile onto the
TPU's (8, 128) vregs with the 3-wide minor axis occupying a sliver of the
lane dimension, so every elementwise fusion over [N, 3] operands runs at
a fraction of the part's HBM bandwidth. tools/layout_probe.py measures a
representative shade-math chain at 3.14x faster in columnar form (582 vs
~185 GB/s effective). The shade stage (ops/shading_cols.py) and the
compacted wavefront's carried state (ops/integrator.py) therefore use
columns; [N, 3] appears only at module boundaries that need it (the
consolidated material row, texture quad rows, the Pallas ray rows).

A "vec" here is a tuple (x, y, z) of same-shaped arrays. All helpers
mirror utils/math3d.py op for op (same operations in the same order), so
columnar results match the [..., 3] forms to reassociation-free float
exactness; only jnp.sum's 3-element reduction order may differ by ULPs.
"""

from __future__ import annotations

import jax.numpy as jnp


def splat(v):
    """[..., 3] array -> (x, y, z) columns."""
    return (v[..., 0], v[..., 1], v[..., 2])


def stack(v):
    """(x, y, z) columns -> [..., 3] array (boundary use only)."""
    return jnp.stack([v[0], v[1], v[2]], axis=-1)


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def neg(a):
    return (-a[0], -a[1], -a[2])


def scale(a, s):
    """Vector times scalar column."""
    return (a[0] * s, a[1] * s, a[2] * s)


def mul(a, b):
    """Componentwise product."""
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def norm_l1(a):
    return jnp.abs(a[0]) + jnp.abs(a[1]) + jnp.abs(a[2])


def length(a):
    return jnp.sqrt(dot(a, a))


def normalize(a, eps: float = 0.0):
    n = length(a)
    if eps:
        n = jnp.maximum(n, eps)
    return (a[0] / n, a[1] / n, a[2] / n)


def where(c, a, b):
    """Per-component select by a scalar boolean column."""
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


# ---------------------------------------------------------------------------
# Columnar quaternions (x, y, z, w) — mirrors math3d's quat helpers.
# ---------------------------------------------------------------------------

def quat_conj(q):
    return (-q[0], -q[1], -q[2], q[3])


def quat_rotate(q, v):
    """v + 2*cross(q.xyz, cross(q.xyz, v) + w*v) (math3d.quat_rotate)."""
    u = (q[0], q[1], q[2])
    w = q[3]
    t = add(cross(u, v), scale(v, w))
    return add(v, scale(cross(u, t), 2.0))


def quat_from_z_to(n):
    """Quaternion mapping +z onto n (math3d.quat_from_z_to,
    shading.odin:104-106), columnar."""
    w = jnp.sqrt(jnp.maximum((1.0 + n[2]) * 0.5, 0.0))
    ok = w > 0
    safe_w = jnp.where(ok, w, 1.0)
    qx = -n[1] / (2.0 * safe_w)
    qy = n[0] / (2.0 * safe_w)
    zero = jnp.zeros_like(w)
    one = jnp.ones_like(w)
    return (
        jnp.where(ok, qx, one),
        jnp.where(ok, qy, zero),
        zero,
        jnp.where(ok, w, zero),
    )
