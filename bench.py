"""Benchmark: demo scene at 1080p on one chip, steady-state throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "Mrays/s",
"vs_baseline": N} where vs_baseline is value / 200 (the BASELINE.json north
star: >= 200 Mrays/sec/chip at 1080p on the demo scene).

Rays are counted as *traced path segments*, measured exactly by the
integrator's live-lane counter — dead-lane slots are not credited. The CLI
throughput line uses the same accounting.

Robustness: the tunneled TPU occasionally wedges on back-to-back launches
(UNAVAILABLE device errors); the measurement runs in a child process and the
parent retries with a cool-down, so one transient fault doesn't sink the
benchmark.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

W, H, DEPTH = 1920, 1080, 8
SCENE_DIR = "/tmp/bench_scenes"


def _measure(scene_name: str = "demo") -> None:
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.render import accum, runtime

    info = assets.generate(scene_name, SCENE_DIR)
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (W / H)
    key = jax.random.PRNGKey(0)

    import os

    cfg = RenderConfig(
        width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
        samples_per_step=1, debug_features=False, intersector="pallas",
        compact="auto",
    )
    # Margin override for sweeps only; the default bench config IS the
    # shipped RenderConfig default (VERDICT r3 item 8). Overflow is still
    # checked, so a too-tight margin fails loudly instead of skewing the
    # number.
    if "RT_TPU_BENCH_MARGIN" in os.environ:
        cfg = cfg.replace(compact_margin=float(os.environ["RT_TPU_BENCH_MARGIN"]))
    # Dead-lane compaction: calibrate static per-bounce lane budgets from a
    # 1-spp measurement, exactly like render_scene with compact="auto".
    schedule = runtime.auto_lane_schedule(scene, cfg, fov_x)
    step = runtime.make_render_step(cfg, fov_x, lane_schedule=schedule)

    stats, _ = step(scene, accum.init_stats(1, H, W), key, jnp.int32(0))
    jax.block_until_ready(stats.count)  # warmup / compile
    # Settle window: the first post-compile steps can catch one-time costs
    # (persistent-cache serialization of the ~90MB compiled program, tunnel
    # reconnects) that have nothing to do with steady-state throughput —
    # run a few untimed steps before measuring.
    for s in (1, 2, 3):
        stats, _ = step(scene, stats, key, jnp.int32(s))
    jax.block_until_ready(stats.count)
    # Measurement: 4 windows x 4 steps (16 steps ~ 5+ s of device time).
    # Each window syncs once so a per-window spread can be reported; rays
    # accumulate on device and are read once at the end. The headline is
    # the MEDIAN window (the tunneled device occasionally stalls for
    # hundreds of ms mid-run; the median is the honest steady-state, and
    # best/worst/mean are all reported in detail).
    n_windows, steps_per_window = 4, 4
    rays_dev = None
    window_s = []
    window_rays = []
    sample = 4
    t0 = time.perf_counter()
    for _w in range(n_windows):
        w0 = time.perf_counter()
        w_rays = None
        for _ in range(steps_per_window):
            stats, step_rays = step(scene, stats, key, jnp.int32(sample))
            sample += 1
            w_rays = step_rays if w_rays is None else w_rays + step_rays
        jax.block_until_ready(stats.count)
        window_s.append(time.perf_counter() - w0)
        window_rays.append(w_rays)
        rays_dev = w_rays if rays_dev is None else rays_dev + w_rays
    dt = time.perf_counter() - t0
    # step returns int32[2] = (rays, compaction overflow); overflow must be
    # zero or the compacted render dropped energy (calibrated schedules
    # make this a ~never event — fail loudly rather than report a bogus
    # throughput for an invalid render).
    import numpy as np

    rays_over = np.asarray(rays_dev)
    rays = int(rays_over[0])  # measured live path segments
    if int(rays_over[1]) != 0:
        raise RuntimeError(
            f"compaction overflow {int(rays_over[1])} lanes — schedule "
            "undershoots; bench result would be invalid"
        )
    window_rays = [int(np.asarray(r)[0]) for r in window_rays]

    n_steps = n_windows * steps_per_window
    spp = n_steps * cfg.samples_per_step
    mrays = rays / dt / 1e6
    w_mrays = sorted(
        int(r) / s / 1e6 for r, s in zip(window_rays, window_s)
    )
    median_mrays = (
        w_mrays[len(w_mrays) // 2]
        if len(w_mrays) % 2
        else (w_mrays[len(w_mrays) // 2 - 1] + w_mrays[len(w_mrays) // 2]) / 2
    )

    print(json.dumps({
        "metric": f"{scene_name} scene 1080p path tracing throughput (1 chip)",
        "value": round(median_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(median_mrays / 200.0, 4),
        "detail": {
            "mean_mrays_all_windows": round(mrays, 2),
            "mean_path_length": round(rays / (W * H * spp), 3),
            "seconds_per_sample": round(dt / spp, 3),
            "steps_measured": n_steps,
            "window_mrays_best": round(w_mrays[-1], 2),
            "window_mrays_median": round(median_mrays, 2),
            "window_mrays_worst": round(w_mrays[0], 2),
            "depth": DEPTH,
            "resolution": f"{W}x{H}",
            "triangles": int(scene.tri_p.shape[0]),
            "device": str(jax.devices()[0]),
        },
    }))


def _measure_mesh(n_devices: int, n_spp: int, rows_per_dev: int = 0) -> None:
    """Sharded render over an n_devices virtual CPU mesh: per-device load
    balance + steps/s. Real multi-chip hardware is not reachable from this
    host (the driver's dryrun covers compile+execute); virtual devices
    share one core, so wall-clock here is NOT a scaling claim — the
    recorded table is about sharding correctness and balance.

    rows_per_dev > 0 switches to WEAK scaling (fixed per-device work,
    image height = rows_per_dev * tile axis): on the single shared host
    core an N-device step then costs ~N x the 1-device step PLUS whatever
    the shard_map/collective machinery adds — so t_N - N*t_1 bounds the
    per-step collective+regroup overhead of the tile sharding (whose only
    cross-device traffic is one scalar int32 psum; see parallel/mesh.py).
    CPU collectives are not ICI, but the sharded program structure (psum
    insertion, per-device partitioning) is identical."""
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.parallel import mesh as pmesh
    from raytracer_odin_tpu.render import accum

    w, h, depth = 192, 108, 4
    n_tile = n_devices // n_spp
    if rows_per_dev:
        h = rows_per_dev * n_tile
    info = assets.generate("demo", SCENE_DIR)
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (w / h)

    m = pmesh.make_mesh(n_tile=n_tile, n_spp=n_spp)
    cfg = RenderConfig(
        width=w, height=h, ray_depth=depth, samples=1 << 30,
        samples_per_step=n_spp, debug_features=False, intersector="auto",
    )
    step = pmesh.make_sharded_render_step(cfg, fov_x, m, scene)
    scene = pmesh.replicate_scene(scene, m)
    h_pad = pmesh.padded_height(h, n_tile)
    stats = pmesh.shard_stats(accum.init_stats(1, h_pad, w), m)
    key = jax.random.PRNGKey(0)

    stats, rays = step(scene, stats, key, jnp.int32(0))
    jax.block_until_ready(stats.count)  # compile+warmup
    t0 = time.perf_counter()
    n_steps = 3
    for i in range(n_steps):
        stats, step_rays = step(scene, stats, key, jnp.int32(n_spp * (1 + i)))
        rays = rays + step_rays
    jax.block_until_ready(stats.count)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": (
            "virtual-mesh weak-scaling step (fixed per-device work)"
            if rows_per_dev
            else "virtual-mesh sharded render (load-balance dryrun)"
        ),
        "devices": n_devices,
        "mesh": f"{n_tile}x{n_spp} (tile x spp)",
        "resolution": f"{w}x{h}",
        "rows_per_device": h_pad // n_tile,
        "padded_rows": h_pad - h,
        "rays_per_step": int(rays) // (n_steps + 1),
        "seconds_per_step": round(dt / n_steps, 4),
        "note": "virtual CPU devices share one core; wall-clock is not a "
                "scaling claim",
    }))


def main(scene_name: str = "demo") -> int:
    import os

    attempts = 3
    # Big scenes / fresh kernel shapes can spend >30 min in XLA compile on
    # a contended host; a too-tight timeout kills the child mid-TPU-program,
    # which wedges the tunneled chip for the NEXT run too.
    child_timeout = int(os.environ.get("RT_BENCH_CHILD_TIMEOUT", "2400"))
    proc = None
    for k in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", "--scene", scene_name],
                capture_output=True, text=True, timeout=child_timeout,
            )
        except subprocess.TimeoutExpired:
            # treat as a failed attempt instead of crashing the sweep
            if k < attempts - 1:
                time.sleep(180)  # killed mid-program: let the device recover
            continue
        line = ""
        for ln in (proc.stdout or "").splitlines():
            if ln.startswith("{"):
                line = ln
        if proc.returncode == 0 and line:
            print(line)
            return 0
        if k < attempts - 1:
            time.sleep(120)  # let a wedged device recover
    sys.stderr.write(
        (proc.stderr[-2000:] if proc is not None and proc.stderr else "")
        or "bench failed (child timeout)\n"
    )
    return 1


def _mesh_main(n_devices: int, n_spp: int, rows_per_dev: int = 0,
               capture: bool = False):
    """Re-exec with the CPU platform forced before jax initializes."""
    import os

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ),
    )
    proc = subprocess.run(
        [sys.executable, __file__, "--mesh-child",
         str(n_devices), str(n_spp), str(rows_per_dev)],
        env=env, text=True, timeout=2400, capture_output=capture,
    )
    if not capture:
        return proc.returncode
    for ln in (proc.stdout or "").splitlines():
        if ln.startswith("{"):
            return json.loads(ln)
    raise RuntimeError(proc.stderr[-2000:] if proc.stderr else "mesh child failed")


def _scaling_main(rows_per_dev: int = 32) -> int:
    """VERDICT r4 item 4: measure the sharded step at FIXED per-device work
    for 1/2/4/8 devices on the virtual CPU mesh and report the collective
    overhead fraction the 'N chips ~ N x single-chip' claim depends on.

    All virtual devices share ONE host core here, so ideal weak scaling is
    t_N = N * t_1 (serialized compute, zero-cost collectives); the measured
    overhead_frac_N = (t_N - N*t_1) / t_N is an upper bound on what the
    shard_map partitioning + psum machinery adds per step. Prints one JSON
    line with the table."""
    rows = []
    for n in (1, 2, 4, 8):
        r = _mesh_main(n, 1, rows_per_dev, capture=True)
        rows.append(r)
    t1 = rows[0]["seconds_per_step"]
    table = []
    for r in rows:
        n = r["devices"]
        tn = r["seconds_per_step"]
        table.append({
            "devices": n,
            "seconds_per_step": tn,
            "ideal_serialized": round(n * t1, 4),
            "overhead_frac": round(max(0.0, tn - n * t1) / tn, 4),
        })
    print(json.dumps({
        "metric": "virtual-mesh weak scaling (fixed per-device work, "
                  "1 shared host core)",
        "rows_per_device": rows_per_dev,
        "table": table,
        "collectives_per_step": "one int32 psum (ray count); stats stay "
                                "device-local on the tile axis",
    }))
    return 0


if __name__ == "__main__":
    scene_name = "demo"
    if "--scene" in sys.argv:
        scene_name = sys.argv[sys.argv.index("--scene") + 1]
    if "--child" in sys.argv:
        _measure(scene_name)
    elif "--mesh-child" in sys.argv:
        i = sys.argv.index("--mesh-child")
        _measure_mesh(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                      int(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 0)
    elif "--scaling" in sys.argv:
        sys.exit(_scaling_main())
    elif "--devices" in sys.argv:
        i = sys.argv.index("--devices")
        nd = int(sys.argv[i + 1])
        ns = 1
        if "--spp-devices" in sys.argv:
            ns = int(sys.argv[sys.argv.index("--spp-devices") + 1])
        sys.exit(_mesh_main(nd, ns))
    else:
        sys.exit(main(scene_name))
