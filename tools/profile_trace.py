"""Profile the demo-scene render step on the real TPU and print a device-time
cost split aggregated from the jax.profiler trace.

Run serialized via: bash tools/tpu_run.sh tools/profile_trace.py /tmp/prof.txt
(host-side timing through the relay is unreliable; only the device trace
events are trusted — see ROADMAP.md / memory notes).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

W, H, DEPTH = 1920, 1080, 8
STEPS = int(os.environ.get("RT_PROFILE_STEPS", "2"))
TRACE_DIR = os.environ.get("RT_PROFILE_DIR", "/tmp/rt_trace")
SCENE = os.environ.get("RT_PROFILE_SCENE", "demo")


def run_render() -> None:
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.render import accum, runtime

    info = assets.generate(SCENE, "/tmp/bench_scenes")
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (W / H)
    key = jax.random.PRNGKey(0)

    cfg = RenderConfig(
        width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
        samples_per_step=1, debug_features=False, intersector="pallas",
        # Profile exactly what bench.py measures: the dead-lane-compacted
        # step (pass "--uncompacted" for the full-width wavefront).
        compact="off" if "--uncompacted" in sys.argv else "auto",
    )
    schedule = (
        runtime.auto_lane_schedule(scene, cfg, fov_x)
        if cfg.compact == "auto" else None
    )
    step = runtime.make_render_step(cfg, fov_x, lane_schedule=schedule)
    stats, _ = step(scene, accum.init_stats(1, H, W), key, jnp.int32(0))
    jax.block_until_ready(stats.count)  # compile + warmup

    with jax.profiler.trace(TRACE_DIR):
        for i in range(STEPS):
            stats, rays = step(scene, stats, key, jnp.int32(1 + i))
        jax.block_until_ready(stats.count)
    import numpy as _np

    # compacted steps return int32[2] = (rays, overflow)
    print(f"rays per step: {int(_np.asarray(rays).ravel()[0])}")


CATEGORIES = [
    ("cast", re.compile(r"pallas|custom-call|culled|intersect", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("gather", re.compile(r"gather|dynamic-slice", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv/dot", re.compile(r"convolution|dot|einsum", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy", re.compile(r"copy|transpose|bitcast|concatenate|reshape", re.I)),
]


def parse_trace() -> None:
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # Device PIDs: process_name metadata mentioning TPU/device.
    dev_pids = set()
    op_tids = set()  # (pid, tid) of "XLA Ops" threads: leaf, non-overlapping
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name":
            if ("TPU" in name or "/device" in name.lower()) and "host" not in name.lower():
                dev_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name" and "XLA Ops" in name:
            op_tids.add((e.get("pid"), e.get("tid")))

    # Self-times: ops on the "XLA Ops" line nest (while/closed_call wrap
    # their bodies) — subtract child durations from the enclosing event.
    per_tid = defaultdict(list)
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("pid") in dev_pids
            and (e.get("pid"), e.get("tid")) in op_tids
        ):
            per_tid[(e["pid"], e["tid"])].append(e)

    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    for evs in per_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (ts, dur, op_name)
        for e in evs:
            ts, dur = e["ts"], float(e.get("dur", 0.0))  # microseconds
            while stack and ts >= stack[-1][0] + stack[-1][1]:
                stack.pop()
            name = e.get("name", "").split(".")[0]
            if stack:
                by_op[stack[-1][2]] -= dur  # child: not parent's self time
            stack.append((ts, dur, name))
            by_op[name] += dur
    total = sum(by_op.values())
    for name, dur in by_op.items():
        for cat, rx in CATEGORIES:
            if rx.search(name):
                by_cat[cat] += dur
                break
        else:
            by_cat["fusion/other"] += dur

    per_step = total / max(STEPS, 1) / 1e3
    print(f"\ndevice total: {total/1e3:.1f} ms ({per_step:.1f} ms/step, {STEPS} steps)")
    print("\nby category (ms/step):")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:14s} {us/1e3/STEPS:8.1f}  ({100*us/total:4.1f}%)")
    print("\ntop 25 ops (ms/step):")
    for op, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1e3/STEPS:8.2f}  {op[:100]}")


if __name__ == "__main__":
    if "--parse-only" not in sys.argv:
        run_render()
    parse_trace()
