"""End-to-end CLI tests (subprocess; the real user surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raytracer_odin_tpu.io import images
from raytracer_odin_tpu.models import assets

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    JAX_PLATFORM_NAME="cpu",
)


def run_cli(*args, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "raytracer_odin_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


@pytest.fixture(scope="module")
def cube_gltf(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_scenes")
    return assets.generate("cube", d)["gltf"]


def test_basic_render(cube_gltf, tmp_path):
    out = tmp_path / "out.png"
    r = run_cli(
        cube_gltf, str(out), "--width", "24", "--height", "24",
        "--ray-depth", "2", "--num-samples", "2", "--quiet",
    )
    assert r.returncode == 0, r.stderr
    img = images.load_image(out)
    assert img.data.shape == (24, 24, 3)
    assert img.data.max() > 0


def test_ppm_output_and_modes(cube_gltf, tmp_path):
    out = tmp_path / "out.ppm"
    r = run_cli(
        cube_gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2", "--mode", "count", "--quiet",
    )
    assert r.returncode == 0, r.stderr
    img = images.load_image(out)
    assert img.data.shape == (16, 16, 3)


def test_times_benchmark_summary(cube_gltf, tmp_path):
    r = run_cli(
        cube_gltf, "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2", "--times", "2",
    )
    assert r.returncode == 0, r.stderr
    assert "Performance Summary" in r.stdout


def test_checkpoint_flag(cube_gltf, tmp_path):
    ck = tmp_path / "ck.npz"
    out = tmp_path / "o.png"
    r = run_cli(
        cube_gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2",
        "--checkpoint", str(ck), "--quiet",
    )
    assert r.returncode == 0, r.stderr
    assert ck.exists()
    r2 = run_cli(
        cube_gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "4",
        "--checkpoint", str(ck), "--resume", "--quiet",
    )
    assert r2.returncode == 0, r2.stderr


def test_oracle_mode(cube_gltf, tmp_path):
    out = tmp_path / "oracle.png"
    r = run_cli(
        cube_gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2", "--oracle", "--quiet",
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_missing_scene_fails():
    r = run_cli("/nonexistent/scene.gltf", "--quiet")
    assert r.returncode != 0


def test_env_map_flag(tmp_path):
    from raytracer_odin_tpu.io import hdr
    from raytracer_odin_tpu.models.assets import procedural_sky

    d = tmp_path
    gltf = assets.generate("cube", d)["gltf"]
    hdr_path = d / "sky.hdr"
    hdr_path.write_bytes(hdr.encode(procedural_sky(32, 16)))
    out = d / "env.png"
    r = run_cli(
        gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2",
        "--env-map", str(hdr_path), "--quiet",
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()


def test_pool_flag(cube_gltf, tmp_path):
    out = tmp_path / "pool.png"
    r = run_cli(
        cube_gltf, str(out), "--width", "16", "--height", "16",
        "--ray-depth", "2", "--num-samples", "2", "--pool", "--quiet",
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()
