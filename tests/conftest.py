"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md section 4)."""

import os

# The image sets JAX_PLATFORMS=axon (the TPU tunnel plugin) and a
# sitecustomize that imports jax at interpreter startup, so env vars alone
# arrive too late — force the CPU backend through jax.config as well (it
# takes effect as long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count not applied"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def scene_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("scenes")


@pytest.fixture(scope="session")
def cube_scene(scene_dir):
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.io import gltf

    info = assets.generate("cube", scene_dir)
    host = gltf.read_gltf(info["gltf"])
    return host, build.finish_scene(host)


@pytest.fixture(scope="session")
def cornell_scene(scene_dir):
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.io import gltf

    info = assets.generate("cornell", scene_dir)
    host = gltf.read_gltf(info["gltf"])
    return host, build.finish_scene(host)


@pytest.fixture(scope="session")
def textured_scene(scene_dir):
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.io import gltf

    info = assets.generate("textured", scene_dir)
    host = gltf.read_gltf(info["gltf"])
    return host, build.finish_scene(host)


def random_triangles(rng, n, lo=-5, hi=5, max_size=1.0):
    p = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    u = rng.uniform(-max_size, max_size, (n, 3)).astype(np.float32)
    v = rng.uniform(-max_size, max_size, (n, 3)).astype(np.float32)
    return p, u, v
