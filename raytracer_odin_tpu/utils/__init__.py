from raytracer_odin_tpu.utils import math3d, rng  # noqa: F401
