"""Profiling utilities + per-pixel ray-path logging (debug_rays)."""

import numpy as np

from raytracer_odin_tpu.render import debug_rays
from raytracer_odin_tpu.utils import profiling


def test_phase_timer_report():
    t = profiling.PhaseTimer()
    with t.phase("build"):
        pass
    with t.phase("render"):
        pass
    with t.phase("render"):
        pass
    rep = t.report(rays_cast=1_000_000)
    assert "build" in rep and "render" in rep
    assert "Mrays/s" in rep
    assert "total" in rep


def test_trace_pixel_paths(cube_scene):
    host, scene = cube_scene
    segs = debug_rays.trace_pixel_paths(
        scene, 32, 32, host.cam.fov_x, depth=3, px=16, py=16, samples=4, seed=0
    )
    assert len(segs) >= 4  # at least one segment per sample
    for s in segs:
        assert s.origin.shape == (3,)
        assert s.bounce >= 0 and s.sample < 4
        assert len(s.color) == 3
    # primary segments start at the camera
    prim = [s for s in segs if s.bounce == 0]
    for s in prim:
        assert np.allclose(s.origin, np.asarray(scene.cam_pos), atol=1e-5)


def test_preview_pixel_overlay(cube_scene):
    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.render import preview, runtime

    host, scene = cube_scene
    cfg = RenderConfig(width=16, height=16, ray_depth=2, samples=2,
                       samples_per_step=2, debug_features=False)
    res = runtime.render_scene(scene, cfg, host.cam.fov_x)
    pv = preview.Preview(
        np.asarray(scene.cam_pos), np.asarray(scene.cam_basis),
        host.cam.fov_x, (16, 16), scene=scene, ray_depth=2,
    )
    pv.update(res.stats, 2)
    base = pv.frame(0, "mean")
    overlaid = pv.frame(0, "mean", pixel=(8, 8))
    assert overlaid.shape == base.shape
    assert not np.array_equal(base, overlaid)  # rays drew something
