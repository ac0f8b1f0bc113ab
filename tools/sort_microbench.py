"""Microbenchmark lax.sort shapes the render step actually runs, on the
real chip — calibrates the sort bucket's floor op by op.

Cases (demo 1080p compacted step):
  A. bounce-1 regroup: 2.07M lanes, 4 i32 keys + 13 f32 payload
  B. final merge: 2.07M lanes, 1 i32 key (a permutation) + 3 f32 payload
  C. final merge input built from an 8-piece concatenate (as in-graph)
  D. B but key pre-offset to be nearly sorted (piece-local runs)

Run: bash tools/tpu_run.sh tools/sort_microbench.py /tmp/sortbench.txt
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4050 * 512  # 2.0736M, the demo step's padded lane count


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:50s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    keys4 = [jnp.asarray(rng.integers(0, 2**31, N, dtype=np.int32))
             for _ in range(4)]
    pay13 = [jnp.asarray(rng.random(N, dtype=np.float32)) for _ in range(13)]
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    pay3 = pay13[:3]

    timeit("A: 4 i32 keys + 13 f32 payload (bounce sort)",
           lambda *xs: jax.lax.sort(xs, num_keys=4), *keys4, *pay13)
    timeit("A1: 1 i32 key + 13 f32 payload",
           lambda *xs: jax.lax.sort(xs, num_keys=1), keys4[0], *pay13)
    timeit("B: 1 i32 perm key + 3 f32 payload (final merge)",
           lambda *xs: jax.lax.sort(xs, num_keys=1), perm, *pay3)

    # C: in-graph shape — concatenate 8 pieces then sort
    sizes = [N // 8] * 8
    pieces_k = []
    pieces_p = [[] for _ in range(3)]
    at = 0
    perm_np = np.asarray(perm)
    for s in sizes:
        pieces_k.append(jnp.asarray(perm_np[at:at + s]))
        for j in range(3):
            pieces_p[j].append(jnp.asarray(np.asarray(pay3[j])[at:at + s]))
        at += s

    def concat_sort(*flat):
        ks = flat[:8]
        ps = [flat[8 + 8 * j: 16 + 8 * j] for j in range(3)]
        k = jnp.concatenate(ks)
        cols = [jnp.concatenate(p) for p in ps]
        return jax.lax.sort((k, *cols), num_keys=1)

    flat = list(pieces_k) + [p for j in range(3) for p in pieces_p[j]]
    timeit("C: concat(8 pieces) + sort (as in step)", concat_sort, *flat)

    # D: nearly-sorted key (ascending with small noise)
    near = jnp.asarray(
        np.clip(np.arange(N) + rng.integers(-256, 256, N), 0, N).astype(
            np.int32
        )
    )
    timeit("D: nearly-sorted i32 key + 3 f32 payload",
           lambda *xs: jax.lax.sort(xs, num_keys=1), near, *pay3)

    # E: sort cost vs payload width at fixed keys
    for w in (0, 3, 6, 13):
        timeit(f"E{w}: 1 i32 key + {w} f32 payload",
               lambda *xs: jax.lax.sort(xs, num_keys=1), perm, *pay13[:w])

    # F: width scaling at the bounce-sort shape
    for frac in (2, 4):
        n = N // frac
        timeit(f"F: 4 keys + 13 payload at N/{frac}",
               lambda *xs: jax.lax.sort(xs, num_keys=4),
               *[k[:n] for k in keys4], *[p[:n] for p in pay13])


if __name__ == "__main__":
    main()
