"""Tracing / profiling.

The reference has only coarse wall-time prints (BVH build times,
raytracer.odin:71-76; per-trial render times + summary,
raytracer.odin:626-664). The TPU build provides (SURVEY.md section 5):

  * `PhaseTimer` — wall-time per phase (ingest / build / upload / render /
    readback) with a printable report and a derived rays/sec metric;
  * `trace()` — context manager around `jax.profiler` emitting a
    TensorBoard-loadable device trace for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    phases: dict = field(default_factory=dict)
    order: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.phases:
                self.order.append(name)
                self.phases[name] = 0.0
            self.phases[name] += dt

    def report(self, rays_cast: int | None = None) -> str:
        lines = ["--- phase timings ---"]
        total = sum(self.phases.values())
        for name in self.order:
            dt = self.phases[name]
            lines.append(f"{name:>12}: {dt*1000:9.1f} ms ({dt/max(total,1e-9)*100:4.1f}%)")
        lines.append(f"{'total':>12}: {total*1000:9.1f} ms")
        if rays_cast and "render" in self.phases and self.phases["render"] > 0:
            mrays = rays_cast / self.phases["render"] / 1e6
            lines.append(f"{'throughput':>12}: {mrays:9.2f} Mrays/s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
