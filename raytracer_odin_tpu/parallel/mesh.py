"""Multi-chip rendering over a `jax.sharding.Mesh`.

The reference's only parallelism is CPU threads pulling (tile x sample-chunk)
work items off an atomic counter (raytracer.odin:550-560). The TPU-native
equivalent (SURVEY.md sections 2/5): a 2D device mesh

    ("tile", "spp")

* **tile axis** — image rows sharded across chips (data parallel over
  pixels). Scene/BVH/textures are replicated (they fit HBM); no per-bounce
  cross-chip traffic at all.
* **spp axis** — samples-per-pixel sharded across chips for small images:
  each chip renders the full tile block with a disjoint set of sample
  indices, and the additive accumulator fields are merged with one `psum`
  per step — the only collective in the renderer, riding ICI.

Per-pixel counter-based RNG streams (utils/prng.uniforms) make every mesh
shape render exactly the same sample set. Tile-only meshes (spp axis = 1)
are **bit-identical** to the single-chip render, including across steps:
the local accumulation chain associates identically (asserted with
np.array_equal in tests/test_parallel.py). Sharding the spp axis changes
only the *summation order* of the per-sample values (the psum reduction
tree replaces the single-chip sequential chain), so those results agree to
float-accumulation tolerance, not bitwise — the same caveat as any
all-reduce. Host<->device traffic is scene upload once + framebuffer
readback per snapshot, never per step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer_odin_tpu.config import RenderConfig
from raytracer_odin_tpu.ops.integrator import TraceOptions
from raytracer_odin_tpu.render import accum
from raytracer_odin_tpu.render.runtime import sample_pass


def padded_height(height: int, n_tile: int) -> int:
    """Internal row count for tile sharding: the smallest multiple of
    n_tile covering the image. Extra rows are rendered-and-cropped so any
    user resolution works (accum.crop drops them at readout)."""
    return -(-height // n_tile) * n_tile


def make_mesh(n_tile: Optional[int] = None, n_spp: int = 1,
              devices=None) -> Mesh:
    """Build a ("tile", "spp") mesh. Defaults: all devices on the tile axis."""
    devices = devices if devices is not None else jax.devices()
    if n_tile is None:
        n_tile = len(devices) // n_spp
    use = np.array(devices[: n_tile * n_spp]).reshape(n_tile, n_spp)
    return Mesh(use, ("tile", "spp"))


def shard_stats(stats: accum.Stats, mesh: Mesh) -> accum.Stats:
    """Place the accumulator with rows sharded over the tile axis and
    replicated over spp."""
    s4 = NamedSharding(mesh, P(None, "tile", None, None))
    s3 = NamedSharding(mesh, P(None, "tile", None))
    return accum.Stats(
        first=jax.device_put(stats.first, s4),
        last=jax.device_put(stats.last, s4),
        total=jax.device_put(stats.total, s4),
        total_sq=jax.device_put(stats.total_sq, s4),
        count=jax.device_put(stats.count, s3),
    )


def replicate_scene(scene, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), scene)


def make_sharded_render_step(cfg: RenderConfig, fov_x: float, mesh: Mesh,
                             scene) -> Callable:
    """Jitted multi-chip step: (scene, stats, base_key, sample_start) ->
    (stats, rays), computing cfg.samples_per_step *global* samples per
    pixel. All cfg.num_layers layers are accumulated (AOVs included when
    cfg.debug_features); `rays` is the replicated global int32 count of
    path segments cast, same accounting as the single-chip step.

    cfg.samples_per_step must be divisible by the spp axis size. Any image
    height works: rows are padded internally to the tile axis (the stats
    arrays passed in/out are [L, padded_height(H, n_tile), W]; crop with
    accum.crop at readout).
    """
    n_tile = mesh.shape["tile"]
    n_spp = mesh.shape["spp"]
    H, W = cfg.height, cfg.width
    H_pad = padded_height(H, n_tile)
    if cfg.samples_per_step % n_spp:
        raise ValueError(
            f"samples_per_step {cfg.samples_per_step} not divisible by spp axis {n_spp}"
        )
    h_local = H_pad // n_tile
    s_local = cfg.samples_per_step // n_spp
    n_layers = cfg.num_layers

    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=cfg.debug_features,
    )

    from jax.experimental.shard_map import shard_map

    from raytracer_odin_tpu.render.runtime import sample_layer_values

    def local_block(scene, stats, base_key, sample_start):
        """Runs per device: render s_local samples of the local row block.
        Returns updated total/total_sq (seeded with the incoming stats on
        spp device 0, so the accumulation chain associates exactly like the
        single-chip step — bit-identical for tile-only meshes), local
        first/last deltas, and the local ray count."""
        tile_idx = jax.lax.axis_index("tile")
        spp_idx = jax.lax.axis_index("spp")
        row_offset = tile_idx * h_local

        def one(carry, k):
            total, total_sq, first, last, rays = carry
            sample_idx = sample_start + spp_idx * s_local + k
            radiance, aux = sample_pass(
                scene, base_key, sample_idx, fov_x, W, H, opts,
                row_offset=row_offset, n_rows=h_local,
            )
            vals = sample_layer_values(radiance, aux, cfg.debug_features)
            first = jnp.where((k == 0), vals, first)
            return (total + vals, total_sq + vals * vals,
                    first, vals, rays + aux["rays_cast"]), None

        z = jnp.zeros((n_layers, h_local, W, 3), jnp.float32)
        seed = spp_idx == 0  # stats ride exactly one spp device into the psum
        (total, total_sq, first, last, rays), _ = jax.lax.scan(
            one,
            (jnp.where(seed, stats.total, 0.0),
             jnp.where(seed, stats.total_sq, 0.0),
             z, z, jnp.zeros((), jnp.int32)),
            jnp.arange(s_local),
        )
        return total, total_sq, first, last, rays

    def step_impl(scene, stats, base_key, sample_start):
        total, total_sq, first, last, rays = local_block(
            scene, stats, base_key, sample_start
        )
        spp_idx = jax.lax.axis_index("spp")
        # Additive merges over the spp axis.
        total = jax.lax.psum(total, "spp")
        total_sq = jax.lax.psum(total_sq, "spp")
        # first: globally-first sample lives on spp device 0;
        # last: globally-last on device n_spp - 1.
        first = jax.lax.psum(jnp.where(spp_idx == 0, first, 0.0), "spp")
        last = jax.lax.psum(jnp.where(spp_idx == n_spp - 1, last, 0.0), "spp")
        # Global ray count, replicated on every device.
        rays = jax.lax.psum(rays, ("tile", "spp"))

        is_first = (stats.count == 0)[..., None]
        new = accum.Stats(
            first=jnp.where(is_first, first, stats.first),
            last=last,
            total=total,
            total_sq=total_sq,
            count=stats.count + float(cfg.samples_per_step),
        )
        return new, rays

    stats_spec = accum.Stats(
        first=P(None, "tile", None, None),
        last=P(None, "tile", None, None),
        total=P(None, "tile", None, None),
        total_sq=P(None, "tile", None, None),
        count=P(None, "tile", None),
    )
    scene_spec = jax.tree_util.tree_map(lambda _: P(), scene)
    sharded = shard_map(
        step_impl,
        mesh=mesh,
        in_specs=(scene_spec, stats_spec, P(), P()),
        out_specs=(stats_spec, P()),
        check_rep=False,
    )

    @partial(jax.jit, donate_argnums=(1,))
    def step(scene, stats, base_key, sample_start):
        return sharded(scene, stats, base_key, sample_start)

    return step
