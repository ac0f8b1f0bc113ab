"""Attribute the render step's biggest fused HLO ops to source operations.

Runs the demo step under jax.profiler, aggregates device time per HLO
instruction name, then maps each expensive fusion back to the ops inside
its fused computation (using the compiled HLO's metadata op_name strings,
which carry jax source paths). Prints a ranked table.

Run: bash tools/tpu_run.sh tools/attr_fusions.py /tmp/attr.txt
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import Counter, defaultdict

W, H, DEPTH = 1920, 1080, 8
TRACE_DIR = "/tmp/rt_attr_trace"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.render import accum, runtime

    info = assets.generate("demo", "/tmp/bench_scenes")
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (W / H)
    key = jax.random.PRNGKey(0)

    # Profile exactly what bench.py measures: the dead-lane-compacted step
    # (pass "--uncompacted" to profile the full-width wavefront instead).
    compact = "off" if "--uncompacted" in sys.argv else "auto"
    cfg = RenderConfig(
        width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
        samples_per_step=1, debug_features=False, intersector="pallas",
        compact=compact,
    )
    schedule = (
        runtime.auto_lane_schedule(scene, cfg, fov_x)
        if compact == "auto" else None
    )
    step = runtime.make_render_step(cfg, fov_x, lane_schedule=schedule)

    stats0 = accum.init_stats(1, H, W)
    # Compiled HLO text for fusion-body attribution.
    compiled = step.lower(scene, stats0, key, jnp.int32(0)).compile()
    hlo = compiled.as_text()

    stats, _ = step(scene, stats0, key, jnp.int32(0))
    jax.block_until_ready(stats.count)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            stats, _ = step(scene, stats, key, jnp.int32(1 + i))
        jax.block_until_ready(stats.count)

    # ---- aggregate device time per HLO instruction name ----
    paths = glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True
    )
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    per_op = Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pidname = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        args = ev.get("args") or {}
        # device lanes have 'run_id'/'correlation_id'-style args; keep all
        # X events whose name looks like an HLO instr and skip host python.
        if not re.match(r"^[a-z][\w.\-]*$", name):
            continue
        if name in ("process_sort", ):
            pass
        per_op[name] += dur
    # The trace double-counts across rows occasionally; we only rank.

    # ---- parse fused computations from HLO text ----
    # computation body: "%fused_computation.N (...) { ... }" and the fusion
    # instr: "%fusion.N = ... fusion(...), kind=..., calls=%fused_computation.N"
    calls = {}
    for m in re.finditer(r"(\w[\w.\-]*) = [^\n]*fusion\([^\n]*calls=%?([\w.\-]+)", hlo):
        calls[m.group(1)] = m.group(2)
    bodies = defaultdict(list)
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+) \([^)]*\) -> .* {", line)
        if line.startswith("ENTRY"):
            cur = "__entry__"
            continue
        if m and "{" in line:
            cur = m.group(1)
            continue
        if cur and line.strip() == "}":
            cur = None
            continue
        if cur:
            om = re.search(r'metadata={op_name="([^"]+)"', line)
            opm = re.match(r"\s*%?[\w.\-]+ = \S+ ([\w\-]+)\(", line)
            if om and opm:
                bodies[cur].append((opm.group(1), om.group(1)))

    print(f"traced ops: {len(per_op)}; fusions in hlo: {len(calls)}")
    total = sum(per_op.values())
    print(f"total device us (2 steps): {total}")

    # Sort instructions: operand tuple shape + source op_name (sorts are
    # not fusions, so attr() has no body for them — shapes identify which
    # in-step sort each trace row is: bounce sorts vs the final merge).
    sort_info = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+) = (\([^)]*\)|\S+) sort\(", line)
        if m:
            om = re.search(r'metadata={op_name="([^"]+)"', line)
            shape = m.group(2)
            n_ops = shape.count("f32") + shape.count("s32") + shape.count(
                "u32") + shape.count("pred")
            sort_info[m.group(1)] = (
                f"{n_ops} operands :: {shape[:140]} :: "
                f"{(om.group(1) if om else '')[-90:]}"
            )

    def attr(name):
        if name in sort_info:
            print(f"              {sort_info[name]}")
            return
        body = bodies.get(calls.get(name, name)) or bodies.get(name)
        if not body:
            return
        src = Counter(
            re.sub(r"jit\(\w+\)/", "", op_name).split("[")[0]
            for kind, op_name in body
            if kind not in ("parameter", "constant")
        )
        for s, c in src.most_common(6):
            print(f"              {c:3d}x {s[-110:]}")

    shown = 0
    for name, dur in per_op.most_common(60):
        ms = dur / 2e3
        if ms < 0.4:
            break
        print(f"{ms:9.2f} ms/step  {name}")
        attr(name)
        shown += 1
    # Aggregate by base name (fusion kind), attributing the biggest
    # instance of each — catches costs spread over many small instrs.
    by_base = Counter()
    biggest = {}
    for name, dur in per_op.items():
        base = name.split(".")[0]
        by_base[base] += dur
        if dur > per_op.get(biggest.get(base, ""), 0):
            biggest[base] = name
    print("\n=== aggregated by base name (ms/step, biggest instance attributed) ===")
    for base, dur in by_base.most_common(20):
        print(f"{dur/2e3:9.2f} ms/step  {base}  (top: {biggest[base]})")
        attr(biggest[base])
    if not shown:
        print("(no per-op events matched; dump head of event names)")
        for name, dur in per_op.most_common(20):
            print(dur, name)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    main()
