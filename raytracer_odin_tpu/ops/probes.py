"""Generic layered debug-probe registry.

The reference lets *any* render code write *any* debug layer through
``debug_rc_set`` (main.odin:104-124, layer machinery main.odin:42-102):
adding an instrumentation layer is one call at the probe site.  This is
the TPU-native re-design of that model: a probe is a *registered
function* evaluated at every path vertex inside the traced integrator,
folded into a per-lane accumulator by a declared reduction.  The
registry is read when the render step is built, so it is static under
jit — layers that exist are fused into the step like hand-written AOV
code, and a registry without extras compiles to exactly the builtin set.

Adding a probe is one line, like ``debug_rc_set``::

    from raytracer_odin_tpu.ops import probes

    probes.register("first_pos", lambda ctx: ctx.material["pos"],
                    reduce="first_hit")

Every registered probe automatically becomes a stats layer (index =
1 + its registry position; layer 0 is always beauty), shows up in the
HTTP preview's layer selector, and is selectable via ``--layer`` on the
CLI.  Register before the render step is built (registration changes
the compiled layer count, so it must precede ``make_render_step`` /
``render_scene``).

Reductions:
  first_hit  write ``fn(ctx)`` at the lane's first live *hit* vertex
  first      write at the lane's first live vertex (hit or env miss)
  sum        accumulate ``fn(ctx)`` over every live vertex
  final      evaluated once after the loop; ctx carries only
             ``radiance`` (e.g. the firefly anomaly mask)

The builtin AOV set (config.LAYER_*) is expressed through this same API
below — the registry IS the layer list, not a parallel mechanism.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from raytracer_odin_tpu.utils.math3d import norm_l1


class ProbeCtx(NamedTuple):
    """What a probe sees at one path vertex (post-shade).

    For ``reduce="final"`` probes only ``radiance`` is populated.
    """

    bounce: object = None       # traced int32 scalar: vertex index
    o: object = None            # [..., 3] incoming ray origin
    d: object = None            # [..., 3] incoming ray direction
    t: object = None            # [...] hit distance (garbage on miss)
    hit: object = None          # [...] bool: live lane hit a triangle
    missed: object = None       # [...] bool: live lane escaped to env
    alive: object = None        # [...] bool: lane was live at this vertex
    material: object = None     # Point_Material dict (color, emission,
                                # texcoords, pos, metallic, roughness, ...)
    normal: object = None       # [..., 3] shading normal
    pdf: object = None          # [...] mixture pdf of the sampled dir
    value: object = None        # [..., 3] BRDF value for the sampled dir
    new_d: object = None        # [..., 3] sampled continuation direction
    throughput: object = None   # [..., 3] path throughput after update
    radiance: object = None     # [..., 3] accumulated radiance so far


class Probe(NamedTuple):
    name: str
    fn: Callable[[ProbeCtx], object]
    reduce: str               # "first_hit" | "first" | "sum" | "final"
    channels: int             # 1, 2 or 3 (accumulator trailing dim)
    display: Optional[Callable]  # accumulator -> [..., 3] view (None=auto)

    def init(self, batch_shape):
        shape = batch_shape if self.channels == 1 else (
            batch_shape + (self.channels,)
        )
        return jnp.zeros(shape, jnp.float32)

    def _mask(self, v, m):
        return jnp.where(m if self.channels == 1 else m[..., None], v, 0.0)

    def fold(self, acc, ctx: ProbeCtx, first):
        v = jnp.asarray(self.fn(ctx), jnp.float32)
        if self.reduce == "first_hit":
            m = first & ctx.alive & ctx.hit
        elif self.reduce == "first":
            m = first & ctx.alive
        elif self.reduce == "sum":
            return acc + self._mask(v, ctx.alive)
        else:
            raise ValueError(f"unknown reduce {self.reduce!r}")
        m = m if self.channels == 1 else m[..., None]
        return jnp.where(m, v, acc)

    def display_value(self, acc):
        if self.display is not None:
            return self.display(acc)
        if self.channels == 1:
            return jnp.repeat(acc[..., None], 3, axis=-1)
        if self.channels == 2:
            return jnp.concatenate(
                [acc, jnp.zeros_like(acc[..., :1])], axis=-1
            )
        return acc


_REGISTRY: dict[str, Probe] = {}


def register(name: str, fn: Callable[[ProbeCtx], object], *,
             reduce: str = "first_hit", channels: int = 3,
             display: Optional[Callable] = None) -> None:
    """Register (or replace) a debug layer. One call, like debug_rc_set."""
    if reduce not in ("first_hit", "first", "sum", "final"):
        raise ValueError(f"unknown reduce {reduce!r}")
    _REGISTRY[name] = Probe(name, fn, reduce, channels, display)


def unregister(name: str) -> None:
    _REGISTRY.pop(name, None)


def active() -> list[Probe]:
    return list(_REGISTRY.values())


def names() -> list[str]:
    return list(_REGISTRY)


def num_layers() -> int:
    """Total stats layers in debug mode: beauty + one per probe."""
    return 1 + len(_REGISTRY)


def layer_names() -> list[str]:
    return ["beauty"] + names()


# ---------------------------------------------------------------------------
# Builtin AOV set (config.LAYER_* indices = 1 + registry position).  The
# reference writes its extra layers ad hoc at probe sites (main.odin:
# 104-124); these are our standing ones, expressed via the public API.
# ---------------------------------------------------------------------------

register("normal", lambda c: c.normal, reduce="first_hit",
         display=lambda v: v * 0.5 + 0.5)
register("depth", lambda c: c.t, reduce="first_hit", channels=1)
register("albedo", lambda c: c.material["color"], reduce="first_hit")
register("emission", lambda c: c.material["emission"], reduce="first_hit")
register("uv", lambda c: c.material["texcoords"], reduce="first_hit",
         channels=2)
register("bounces", lambda c: 1.0, reduce="sum", channels=1)
register("anomaly", lambda c: (norm_l1(c.radiance) > 1e3).astype(jnp.float32),
         reduce="final", channels=1)
register("pdf", lambda c: c.pdf, reduce="first_hit", channels=1)
register("miss", lambda c: c.missed.astype(jnp.float32), reduce="first",
         channels=1)
