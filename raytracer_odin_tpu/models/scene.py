"""Scene data model.

The reference keeps an AoS ``Scene`` of ``Triangle`` structs plus materials,
textures and two BVHs (raytracer.odin:18-60). The TPU-native design splits
this into:

  * ``HostScene`` — numpy staging area filled by the glTF ingest
    (io/gltf.py), mirroring the reference's Scene fields.
  * ``DeviceScene`` — a pytree of SoA jnp arrays: triangle soup, material
    table, one flat texture atlas, light list, and the flattened stackless
    BVH. Everything static-shaped so a single jit trace covers the render.

Triangle parameterization matches the reference exactly: p + u*b1 + v*b2 with
u = p2-p1, v = p3-p1 (input.odin:209-224), shading normals n1..n3, texcoords
tex1..tex3, tangents tan1..tan3 (xyzw, w = bitangent sign), geometric normal
ng, material index.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None
    jnp = None


@dataclass
class Camera:
    """Camera (raytracer.odin:45-49): position, 3x3 basis (columns = right,
    up, forward; forward already negated at ingest like input.odin:107),
    horizontal field of view in radians."""

    pos: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    basis: np.ndarray = field(default_factory=lambda: np.eye(3, dtype=np.float32))
    fov_x: float = 1.0


@dataclass
class HostTexture:
    """Decoded image + atlas placement."""

    data: np.ndarray  # float32 [H, W, C] raw (LDR already /255)
    is_hdr: bool

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]


@dataclass
class HostMaterial:
    """glTF metallic-roughness material (raytracer.odin:34-43). Texture slots
    are indices into HostScene.textures, -1 = absent sampler (the reference's
    nil-texture Sampler, textures.odin:21-23)."""

    color_factor: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    emission_factor: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    metallic_factor: float = 1.0
    roughness_factor: float = 1.0
    color_tex: int = -1
    emission_tex: int = -1
    metallic_roughness_tex: int = -1
    normal_tex: int = -1


@dataclass
class HostScene:
    """Staging scene: AoS numpy triangle fields (SoA-ified on upload)."""

    cam: Camera = field(default_factory=Camera)
    # Triangle arrays, each [T, ...]:
    p: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    u: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    v: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    ng: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    n1: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    n2: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    n3: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    tex1: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))
    tex2: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))
    tex3: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))
    tan1: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.float32))
    tan2: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.float32))
    tan3: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.float32))
    mat_index: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    materials: list = field(default_factory=list)
    textures: list = field(default_factory=list)
    env_map: Optional[HostTexture] = None

    @property
    def num_triangles(self) -> int:
        return self.p.shape[0]

    def append_triangles(self, **arrays) -> None:
        for name, arr in arrays.items():
            cur = getattr(self, name)
            setattr(self, name, np.concatenate([cur, np.asarray(arr)], axis=0))


def _register_pytree(cls, static_fields=()):
    """Register a dataclass of arrays as a jax pytree node. `static_fields`
    become aux data: python values that select the compiled program (e.g.
    env-map presence) instead of traced arrays."""
    if jax is None:  # pragma: no cover
        return cls
    fields = [
        f.name for f in dataclasses.fields(cls) if f.name not in static_fields
    ]
    static_fields = tuple(static_fields)

    def flatten(obj):
        aux = tuple(getattr(obj, n) for n in static_fields)
        return [getattr(obj, n) for n in fields], aux

    def unflatten(aux, children):
        kw = dict(zip(fields, children))
        kw.update(dict(zip(static_fields, aux)))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register_pytree
@dataclass
class DeviceBVH:
    """Flattened stackless BVH (built by ops/bvh.py). Traversal state is just
    a node index; per ray-direction octant links give near-child-first order.
    node 0 = root; link value == num_nodes terminates."""

    lo: Any          # [B, 3] f32
    hi: Any          # [B, 3] f32
    first: Any       # [B] i32 — leaf first triangle (into permuted order)
    count: Any       # [B] i32 — leaf triangle count (0 for branch)
    hit_link: Any    # [8, B] i32
    miss_link: Any   # [8, B] i32


@dataclass
class DeviceScene:
    """Device-resident SoA scene pytree (all jnp arrays; `env_tex` is
    static aux — env-map presence selects the compiled program)."""

    # Triangles (BVH-permuted order so leaves index contiguous ranges):
    tri_p: Any       # [T, 3]
    tri_u: Any       # [T, 3]
    tri_v: Any       # [T, 3]
    tri_ng: Any      # [T, 3]
    tri_n: Any       # [T, 3, 3] shading normals (n1, n2, n3)
    tri_tex: Any     # [T, 3, 2] texcoords
    tri_tan: Any     # [T, 3, 4] tangents
    tri_mat: Any     # [T] i32
    # Materials:
    mat_color: Any            # [M, 3]
    mat_emission: Any         # [M, 3]
    mat_metallic: Any         # [M]
    mat_roughness: Any        # [M]
    mat_tex: Any              # [M, 4] i32: color, emission, mr, normal (-1 none)
    # Texture atlas:
    tex_texels: Any           # [P, 16] f32 flat quad-packed texel pool
    # Pre-decoded sRGB view of the pool (ops/texture.srgb_decode_pool):
    # sampled by srgb=True taps. A [1, 16] dummy when no material uses
    # color/emission textures (the only sRGB-sampled kinds).
    tex_texels_srgb: Any      # [P, 16] or [1, 16] f32
    tex_offset: Any           # [K] i32
    tex_width: Any            # [K] i32
    tex_height: Any           # [K] i32
    # Lights (emissive triangles, raytracer.odin:63-66):
    light_p: Any              # [L, 3]
    light_u: Any              # [L, 3]
    light_v: Any              # [L, 3]
    light_ng: Any             # [L, 3]
    light_pdf_factor: Any     # [L] = 2 / |cross(u, v)| (shading.odin:57)
    # Acceleration:
    bvh: DeviceBVH
    light_mask: Any           # [L] 1.0 for real lights, 0 for padding
    # Many-light cluster cull (ops/light_cull.py; lights Morton-ordered):
    light_rows: Any           # [Lpad, 16] packed p/u/v/ng/fac/valid rows
    light_cluster_lo: Any     # [Cl, 3]
    light_cluster_hi: Any     # [Cl, 3]
    # Pallas intersector data (ops/pallas_intersect.py, ops/culling.py):
    ptri: Any                 # [Tpad, 12|128] packed p/u/v rows, LEAF-padded
                              # (128-wide = DMA-streamed; pad_triangles)
    cluster_lo: Any           # [C, 3] treelet-cluster AABBs
    cluster_hi: Any           # [C, 3]
    # Hit-shading row: per-triangle shading attributes + the (per-primitive)
    # material inlined, so material evaluation is ONE contiguous row-gather
    # per hit instead of ~10 scattered gathers. The row layout is
    # scene-specialized (models/build.py): blocks a scene cannot use
    # (texcoords without textures, tangents without normal maps) are not
    # packed at all — the gather is the dominant material-eval cost on TPU,
    # so row width is minimized per scene, exactly like the reference's
    # compile-time feature gating (main.odin:17-18) but keyed on scene
    # content.
    shade_row: Any            # [T, RW] f32, RW static per scene
    # Camera (traced values; fov kept static on the python side too):
    cam_pos: Any              # [3]
    cam_basis: Any            # [3, 3]
    # Environment map texture id: static python int, -1 = none (pytree aux).
    env_tex: int = -1
    # Static shade-row layout: tuple of (block_name, column_offset), pytree
    # aux — selects the compiled program per scene content. Blocks: ng(3),
    # n(9), tex(6), tan(12), color(3), emission(3), metallic(1),
    # roughness(1), texids(4).
    row_spec: tuple = ()
    # Static per-kind texture presence over materials actually referenced by
    # triangles: (color, emission, metallic_roughness, normal). A kind no
    # material uses compiles its atlas gather out entirely.
    tex_kinds: tuple = (False, False, False, False)

    # -- static metadata (not traced; stored via pytree aux would complicate
    #    donation, so kept as plain ints reconstructed from shapes) --
    @property
    def num_triangles(self) -> int:
        return self.tri_p.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_p.shape[0]


_register_pytree(
    DeviceScene, static_fields=("env_tex", "row_spec", "tex_kinds")
)
