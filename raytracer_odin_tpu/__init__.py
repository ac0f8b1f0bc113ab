"""TPU-native wavefront path tracer.

A brand-new JAX/XLA/Pallas renderer with the capabilities of the reference CPU
renderer ``elteammate/raytracer-odin`` (see SURVEY.md): glTF ingest, SAH BVH,
one-sample-MIS path tracing (cosine / light-surface / GGX-VNDF mixture),
Cook-Torrance + Lambert shading, normal mapping, per-pixel statistics with
diagnostic view modes, ACES tone-mapped PPM/PNG output, benchmark harness,
continuous accumulation, and multi-chip scaling over a ``jax.sharding.Mesh``.

The recursive per-pixel CPU loop of the reference (raytracer.odin:432-518)
becomes an iterative fixed-depth wavefront (`ops.integrator`); the stack-based
BVH walk (raytracer.odin:371-414) becomes a stackless SoA traversal with
per-octant hit/miss links (`ops.traverse`); CPU threads + atomic tile counter
(raytracer.odin:525-665) become jitted device steps sharded over the TPU mesh
(`parallel.mesh`, `render.runtime`).
"""

__version__ = "0.1.0"

from raytracer_odin_tpu.config import RenderConfig  # noqa: F401
