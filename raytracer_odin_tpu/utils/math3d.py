"""Vector / quaternion / projection math shared by all device ops.

Covers the reference's utils.odin (sq, norm_l1, compsum, ceil_div,
world_to_screen, line_to_screen) in vectorized jnp form. All functions accept
arrays whose last axis is the vector axis and broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sq(x):
    """x*x (utils.odin:6)."""
    return x * x


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def norm_l1(x):
    """Sum of absolute components (utils.odin:10)."""
    return jnp.sum(jnp.abs(x), axis=-1)


def compsum(x):
    """Component sum (utils.odin:14)."""
    return jnp.sum(x, axis=-1)


def ceil_div(x: int, y: int) -> int:
    """Host-side ceiling division (utils.odin:18)."""
    return (x + y - 1) // y


def length(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def normalize(x, eps: float = 0.0):
    n = length(x)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


# ---------------------------------------------------------------------------
# Quaternions. The reference's VNDF sampler builds the tangent frame with a
# quaternion rotating the shading normal onto +z (shading.odin:104-106).
# Layout: (..., 4) as (x, y, z, w).
# ---------------------------------------------------------------------------

def quat_conj(q):
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q: v + 2*cross(q.xyz, cross(q.xyz,v) + w*v)."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = jnp.cross(u, v) + w * v
    return v + 2.0 * jnp.cross(u, t)


def quat_from_z_to(n):
    """Quaternion mapping local +z onto world direction n (shading.odin:104-106).

    w = sqrt((1+n.z)/2); q = (-n.y/(2w), n.x/(2w), 0, w), falling back to a
    180-degree rotation about x when n.z == -1.
    """
    nz = n[..., 2]
    w = jnp.sqrt(jnp.maximum((1.0 + nz) * 0.5, 0.0))
    safe_w = jnp.where(w > 0, w, 1.0)
    qx = -n[..., 1] / (2.0 * safe_w)
    qy = n[..., 0] / (2.0 * safe_w)
    qz = jnp.zeros_like(w)
    q_main = jnp.stack([qx, qy, qz, w], axis=-1)
    q_flip = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=n.dtype), q_main.shape
    )
    return jnp.where((w > 0)[..., None], q_main, q_flip)


# ---------------------------------------------------------------------------
# Projection helpers for the debug-line overlay (utils.odin:22-98). Host-side
# numpy: these draw on snapshots, not in the hot path.
# ---------------------------------------------------------------------------

def world_to_screen(cam_pos, cam_basis, fov_x, dims, point):
    """Perspective projection of a world point to pixel coords (utils.odin:22-37).

    dims = (width, height). Returns (x, y) with y flipped to image rows; NaN
    when the point is (numerically) in the camera plane.
    """
    p = np.asarray(point, np.float32) - np.asarray(cam_pos, np.float32)
    p = np.linalg.inv(np.asarray(cam_basis, np.float32)) @ p
    if abs(p[2]) < 1e-6:
        return np.array([np.nan, np.nan], np.float32)
    p = p / p[2]
    w, h = float(dims[0]), float(dims[1])
    aspect = w / h
    tan_fx = np.tan(fov_x / 2)
    tan_fy = tan_fx / aspect
    sx = (p[0] / tan_fx * 0.5 + 0.5) * w
    sy = (p[1] / tan_fy * 0.5 + 0.5) * h
    return np.array([sx, h - sy], np.float32)


def line_to_screen(cam_pos, cam_basis, fov_x, dims, p0_world, p1_world):
    """Clip a world-space segment against the 5-plane view frustum and project
    (utils.odin:39-98). Returns (s0, s1, ok)."""
    inv = np.linalg.inv(np.asarray(cam_basis, np.float32))
    p0 = inv @ (np.asarray(p0_world, np.float32) - cam_pos)
    p1 = inv @ (np.asarray(p1_world, np.float32) - cam_pos)
    w, h = float(dims[0]), float(dims[1])
    aspect = w / h
    tan_fx = np.tan(fov_x / 2)
    tan_fy = tan_fx / aspect

    planes = [
        lambda p: p[2] - 1e-3,
        lambda p: p[0] + tan_fx * p[2],
        lambda p: tan_fx * p[2] - p[0],
        lambda p: p[1] + tan_fy * p[2],
        lambda p: tan_fy * p[2] - p[1],
    ]
    for plane in planes:
        f0, f1 = plane(p0), plane(p1)
        if f0 < 0 and f1 < 0:
            return None, None, False
        if f0 < 0:
            t = f0 / (f0 - f1)
            p0 = p0 + (p1 - p0) * t
        elif f1 < 0:
            t = f0 / (f0 - f1)
            p1 = p0 + (p1 - p0) * t

    def project(p):
        p = p / p[2]
        sx = (p[0] / tan_fx * 0.5 + 0.5) * w
        sy = (p[1] / tan_fy * 0.5 + 0.5) * h
        return np.array([sx, h - sy], np.float32)

    return project(p0), project(p1), True
