"""Render runtime tests: accumulation across steps, determinism,
decomposition invariance, interrupts, trials, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_odin_tpu.config import RenderConfig
from raytracer_odin_tpu.render import accum, checkpoint, output, runtime


def small_cfg(**kw):
    base = dict(width=16, height=16, ray_depth=2, samples=4,
                samples_per_step=2, debug_features=False)
    base.update(kw)
    return RenderConfig(**base)


def test_step_accumulation(cube_scene):
    host, scene = cube_scene
    cfg = small_cfg()
    res = runtime.render_scene(scene, cfg, host.cam.fov_x)
    assert res.samples_done == 4
    assert np.allclose(np.asarray(res.stats.count[0]), 4)
    total = np.asarray(res.stats.total[0])
    assert np.isfinite(total).all()
    assert total.max() > 0


def test_determinism_across_step_sizes(cube_scene):
    """Same seed, different samples_per_step -> identical totals (the
    per-(pixel, sample) counter-based streams make batching irrelevant)."""
    host, scene = cube_scene
    r1 = runtime.render_scene(scene, small_cfg(samples_per_step=1), host.cam.fov_x)
    r2 = runtime.render_scene(scene, small_cfg(samples_per_step=4), host.cam.fov_x)
    assert np.allclose(
        np.asarray(r1.stats.total[0]), np.asarray(r2.stats.total[0]),
        rtol=1e-5, atol=1e-5,
    )
    assert np.array_equal(np.asarray(r1.stats.first[0]), np.asarray(r2.stats.first[0]))
    assert np.array_equal(np.asarray(r1.stats.last[0]), np.asarray(r2.stats.last[0]))


def test_seed_changes_result(cube_scene):
    host, scene = cube_scene
    r1 = runtime.render_scene(scene, small_cfg(seed=0), host.cam.fov_x)
    r2 = runtime.render_scene(scene, small_cfg(seed=1), host.cam.fov_x)
    assert not np.allclose(
        np.asarray(r1.stats.total[0]), np.asarray(r2.stats.total[0])
    )


def test_interrupt_stops_render(cube_scene):
    host, scene = cube_scene
    flag = runtime.InterruptFlag()
    flag.set()
    res = runtime.render_scene(
        scene, small_cfg(continuous=True), host.cam.fov_x, interrupt=flag
    )
    assert res.samples_done == 0  # interrupted before the first step


def test_continuous_via_on_step_interrupt(cube_scene):
    """Continuous mode runs until the flag is set mid-render; partial
    accumulation survives (graceful SIGINT semantics, main.odin:170-172)."""
    host, scene = cube_scene
    flag = runtime.InterruptFlag()
    steps = []

    def on_step(stats, n):
        steps.append(n)
        if len(steps) >= 3:
            flag.set()

    res = runtime.render_scene(
        scene, small_cfg(continuous=True), host.cam.fov_x,
        interrupt=flag, on_step=on_step,
    )
    assert res.samples_done == 6  # 3 steps x 2 spp
    assert np.allclose(np.asarray(res.stats.count[0]), 6)


def test_trials_benchmark(cube_scene, capsys):
    host, scene = cube_scene
    res = runtime.render_scene(scene, small_cfg(), host.cam.fov_x, trials=3,
                               verbose=True)
    assert len(res.trial_seconds) == 3
    out = capsys.readouterr().out
    assert "Performance Summary" in out
    assert "Best:" in out and "Median:" in out and "Worst:" in out


def test_checkpoint_roundtrip(cube_scene, tmp_path):
    host, scene = cube_scene
    cfg = small_cfg()
    res = runtime.render_scene(scene, cfg, host.cam.fov_x)
    p = tmp_path / "ck.npz"
    checkpoint.save(p, res.stats, res.samples_done, {"scene": "cube"})
    stats2, n, meta = checkpoint.load(p)
    assert n == res.samples_done
    assert meta["scene"] == "cube"
    assert np.array_equal(np.asarray(stats2.total), np.asarray(res.stats.total))
    # resume: continue to 8 samples total and compare against a straight run
    res2 = runtime.render_scene(
        scene, cfg.replace(samples=8), host.cam.fov_x,
        initial_stats=stats2, initial_samples=n,
    )
    ref = runtime.render_scene(scene, cfg.replace(samples=8), host.cam.fov_x)
    assert np.allclose(
        np.asarray(res2.stats.total[0]), np.asarray(ref.stats.total[0]),
        rtol=1e-5, atol=1e-5,
    )
    assert res2.samples_done == 8


def test_debug_layers_accumulate(cube_scene):
    host, scene = cube_scene
    cfg = small_cfg(debug_features=True)
    res = runtime.render_scene(scene, cfg, host.cam.fov_x)
    from raytracer_odin_tpu import config as c
    assert np.asarray(res.stats.count).shape[0] == 10
    # normal layer: mapped normals in [0,1]; miss layer in {0,1}
    nrm = np.asarray(res.stats.total[c.LAYER_NORMAL]) / 4
    assert nrm.min() >= -1e-5 and nrm.max() <= 1 + 1e-5
    miss = np.asarray(res.stats.total[c.LAYER_MISS]) / 4
    assert set(np.round(np.unique(miss), 5)).issubset({0.0, 0.25, 0.5, 0.75, 1.0})
