"""Persistent wavefront pool: must consume the same sample set as the
batched path (same RNG counter chains, different scheduling) and agree to
tight float tolerance — not bitwise: pool and batch are different XLA
programs (different fusion/FMA choices) and flush sums in different
order."""

import numpy as np
import jax
import pytest

from raytracer_odin_tpu.config import RenderConfig
from raytracer_odin_tpu.render import accum, runtime


def cfg(**kw):
    base = dict(width=16, height=16, ray_depth=3, samples=4,
                samples_per_step=4, debug_features=False)
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("pool_fraction", [0.3, 1.0])
def test_pool_matches_batch(cube_scene, pool_fraction):
    host, scene = cube_scene
    c1 = cfg()
    batch = runtime.render_scene(scene, c1, host.cam.fov_x)
    c2 = cfg(wavefront_pool=True, pool_fraction=pool_fraction)
    pool = runtime.render_scene(scene, c2, host.cam.fov_x)
    # Pool and batch consume identical RNG counter streams (the same
    # sample set), but they are different XLA programs: fusion/FMA
    # decisions differ per shape, and the pool flushes sums in retirement
    # order. Measured divergence is ~1 ULP (4e-7 on O(1) radiance); the
    # assertion is tight float tolerance, NOT bitwise — a bitwise claim
    # across different compiled programs is not meaningful.
    for field in ("total", "total_sq", "first", "last", "count"):
        a = np.asarray(getattr(batch.stats, field)[0])
        b = np.asarray(getattr(pool.stats, field)[0])
        assert np.allclose(a, b, rtol=1e-5, atol=1e-6), (
            field, np.abs(a - b).max()
        )


def test_pool_multi_step_resume(cube_scene):
    """Two pool steps of 2 spp == one batch run of 4 spp."""
    host, scene = cube_scene
    batch = runtime.render_scene(scene, cfg(), host.cam.fov_x)
    c = cfg(wavefront_pool=True, samples_per_step=2)
    pool = runtime.render_scene(scene, c, host.cam.fov_x)
    assert pool.samples_done == 4
    for field in ("total", "first", "last", "count"):
        a = np.asarray(getattr(batch.stats, field)[0])
        b = np.asarray(getattr(pool.stats, field)[0])
        assert np.allclose(a, b, rtol=1e-5, atol=1e-6), field


def test_pool_env_scene():
    """Pool path with env-map misses (env contributions flushed correctly)."""
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import single_quad_scene
    from raytracer_odin_tpu.models.scene import HostTexture

    env = HostTexture(np.full((4, 8, 3), 0.6, np.float32), True)
    scene = single_quad_scene(color=(0.5, 0.5, 0.5), env=env, metallic=0.0)
    c_batch = cfg(width=8, height=8, samples=4, samples_per_step=4)
    fov = 0.8
    batch = runtime.render_scene(scene, c_batch, fov)
    pool = runtime.render_scene(
        scene, c_batch.replace(wavefront_pool=True), fov
    )
    a = np.asarray(batch.stats.total[0])
    b = np.asarray(pool.stats.total[0])
    assert np.allclose(a, b, rtol=1e-5, atol=1e-6), np.abs(a - b).max()
