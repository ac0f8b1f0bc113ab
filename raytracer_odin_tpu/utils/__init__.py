from raytracer_odin_tpu.utils import math3d  # noqa: F401
