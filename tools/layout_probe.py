"""Measure the TPU cost of [N, 3] vector math vs columnar ([N] per
component) on a representative shade-stage chain at wavefront width.

Hypothesis (r5): [N, 3] f32 arrays tile to (8, 128) with only 3 of 8
sublanes used at best (37.5% lane efficiency), so every fusion whose
operands/results are [N, 3] runs at ~0.37x of the 819 GB/s part — which
matches the measured 145-539 GB/s effective bandwidth of the shade
fusions. If the columnar form measures ~2x+ faster here, porting the
shade stage (integrator._shade_vertex + ops/shading.py) to columns is
the round's fusion-bucket lever; if it measures a wash, XLA is already
relayouting/fusing well and the bucket's cost is elsewhere.

The chain imitates one bounce's non-gather shade math: normalize,
cross/dot products, a GGX-style scalar chain, throughput update, masked
radiance accumulation — ~60 elementwise ops, 6 three-element reductions.

Run: bash tools/tpu_run.sh tools/layout_probe.py /tmp/layout_probe.txt
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

N = 1 << 21  # ~2.1M lanes, the 1080p wavefront width


def chain_n3(o, d, n, thr, rad, t, u):
    """[N, 3] form (the repo's current shade-stage shape)."""
    pos = o + d * t[..., None]
    v = -d
    h = v + n
    h = h / jnp.maximum(
        jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True)), 1e-20
    )
    cosine = jnp.sum(n * d, axis=-1)
    hn = jnp.sum(h * n, axis=-1)
    fb = 1.0 - jnp.sum(h * v, axis=-1)
    fres = fb * fb * fb * fb * fb
    alpha2 = (u * u) * (u * u)
    dist = alpha2 * (hn >= 0) / (3.14159 * (((alpha2 - 1.0) * hn * hn + 1.0) ** 2))
    g1 = 2.0 * jnp.maximum(cosine, 0.0) / (
        cosine + jnp.sqrt(alpha2 + (1.0 - alpha2) * cosine * cosine)
    )
    spec = dist * g1 * g1 / (4.0 * jnp.maximum(cosine, 1e-6))
    w = jnp.cross(n, d)
    w = w / jnp.maximum(
        jnp.sqrt(jnp.sum(w * w, axis=-1, keepdims=True)), 1e-20
    )
    val = thr * (spec[..., None] * 0.3 + jnp.maximum(cosine, 0.0)[..., None])
    cont = jnp.sum(jnp.abs(val), axis=-1) > 1e-5
    thr2 = jnp.where(cont[..., None], val, thr)
    rad2 = rad + jnp.where(cont[..., None], thr2 * fres[..., None], 0.0)
    d2 = d - 2.0 * jnp.sum(d * h, axis=-1, keepdims=True) * h
    return pos + w, d2, thr2, rad2


def chain_cols(ox, oy, oz, dx, dy, dz, nx, ny, nz,
               tr, tg, tb, rr, rg, rb, t, u):
    """Columnar form: identical math on [N] component columns."""
    px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
    vx, vy, vz = -dx, -dy, -dz
    hx, hy, hz = vx + nx, vy + ny, vz + nz
    hl = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-20)
    hx, hy, hz = hx / hl, hy / hl, hz / hl
    cosine = nx * dx + ny * dy + nz * dz
    hn = hx * nx + hy * ny + hz * nz
    fb = 1.0 - (hx * vx + hy * vy + hz * vz)
    fres = fb * fb * fb * fb * fb
    alpha2 = (u * u) * (u * u)
    dist = alpha2 * (hn >= 0) / (3.14159 * (((alpha2 - 1.0) * hn * hn + 1.0) ** 2))
    g1 = 2.0 * jnp.maximum(cosine, 0.0) / (
        cosine + jnp.sqrt(alpha2 + (1.0 - alpha2) * cosine * cosine)
    )
    spec = dist * g1 * g1 / (4.0 * jnp.maximum(cosine, 1e-6))
    wx = ny * dz - nz * dy
    wy = nz * dx - nx * dz
    wz = nx * dy - ny * dx
    wl = jnp.maximum(jnp.sqrt(wx * wx + wy * wy + wz * wz), 1e-20)
    wx, wy, wz = wx / wl, wy / wl, wz / wl
    s = spec * 0.3 + jnp.maximum(cosine, 0.0)
    valr, valg, valb = tr * s, tg * s, tb * s
    cont = jnp.abs(valr) + jnp.abs(valg) + jnp.abs(valb) > 1e-5
    tr2 = jnp.where(cont, valr, tr)
    tg2 = jnp.where(cont, valg, tg)
    tb2 = jnp.where(cont, valb, tb)
    rr2 = rr + jnp.where(cont, tr2 * fres, 0.0)
    rg2 = rg + jnp.where(cont, tg2 * fres, 0.0)
    rb2 = rb + jnp.where(cont, tb2 * fres, 0.0)
    dh = dx * hx + dy * hy + dz * hz
    d2x, d2y, d2z = dx - 2.0 * dh * hx, dy - 2.0 * dh * hy, dz - 2.0 * dh * hz
    return (px + wx, py + wy, pz + wz, d2x, d2y, d2z,
            tr2, tg2, tb2, rr2, rg2, rb2)


def device_ms(trace_dir):
    """Sum device-lane op durations from a jax.profiler trace (host wall
    time through the tunneled TPU is unreliable; see profile_trace.py)."""
    import glob
    import gzip
    import json
    import os

    path = max(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids, op_tids = set(), set()
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name":
            if ("TPU" in name or "/device" in name.lower()) \
                    and "host" not in name.lower():
                dev_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name" and "XLA Ops" in name:
            op_tids.add((e.get("pid"), e.get("tid")))
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and (e.get("pid"), e.get("tid")) in op_tids):
            total += float(e.get("dur", 0.0))
    return total / 1e3


def bench(fn, args, label, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/layout_probe_trace_{label.split()[0].strip('[],3')}"
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
    ms = device_ms(trace_dir) / iters
    print(f"{label:32s} {ms:8.3f} ms/iter (device)")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    o = jax.random.normal(ks[0], (N, 3), jnp.float32)
    d = jax.random.normal(ks[1], (N, 3), jnp.float32)
    n = jax.random.normal(ks[2], (N, 3), jnp.float32)
    thr = jax.random.uniform(ks[3], (N, 3), jnp.float32)
    rad = jax.random.uniform(ks[4], (N, 3), jnp.float32)
    t = jax.random.uniform(ks[5], (N,), jnp.float32)
    u = jax.random.uniform(ks[6], (N,), jnp.float32)

    cols = tuple(a[:, i] for a in (o, d, n, thr, rad) for i in range(3))
    ms3 = bench(chain_n3, (o, d, n, thr, rad, t, u), "[N,3] chain")
    msc = bench(chain_cols, cols + (t, u), "columnar chain")
    # bytes: 15 input cols + 12 output cols + t,u = 29 x N x 4
    gb = 29 * N * 4 / 1e9
    print(f"ratio [N,3]/columnar: {ms3 / msc:.2f}")
    print(f"columnar effective BW: {gb / (msc / 1e3):.0f} GB/s "
          f"(ideal stream of all operands)")


if __name__ == "__main__":
    main()
