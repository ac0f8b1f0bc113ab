"""Command-line driver.

Mirrors the reference CLI (main.odin:174-253): positional input scene and
output image, plus --debug --times --continious --threads --width --height
--ray-depth --num-samples --env-map (including the reference's spelling of
"continious"). TPU-era additions: --preview-port/--preview-file (headless
replacements for the SDL2 window), --checkpoint/--resume, --layer/--mode
output selection, --oracle (render with the CPU reference implementation),
--seed, --spp-per-step, --devices/--spp-devices (mesh shape).

Run: python -m raytracer_odin_tpu.cli scene.gltf out.png --width 512 ...
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _layer_arg(v: str) -> int:
    """--layer accepts an index or a registered probe name (ops/probes)."""
    try:
        return int(v)
    except ValueError:
        from raytracer_odin_tpu.ops import probes

        names = probes.layer_names()
        if v in names:
            return names.index(v)
        raise argparse.ArgumentTypeError(
            f"unknown layer {v!r}; known: {', '.join(names)}"
        )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracer_odin_tpu",
        description="TPU-native wavefront path tracer",
    )
    p.add_argument("input_file", help="Input scene (glTF/GLB)")
    p.add_argument("output_file", nargs="?", default="", help="Output image (.png/.ppm)")
    p.add_argument("--debug", action="store_true",
                   help="Enable debug preview (HTTP + snapshots) and AOV layers")
    p.add_argument("--times", type=int, default=0,
                   help="Number of times to render the scene (benchmark trials)")
    p.add_argument("--continious", action="store_true",
                   help="Ignore sample limit and render until interrupted")
    p.add_argument("--threads", type=int, default=0,
                   help="Accepted for parity; device parallelism is set by --devices")
    p.add_argument("--width", type=int, default=0, help="Width of the output image")
    p.add_argument("--height", type=int, default=0, help="Height of the output image")
    p.add_argument("--ray-depth", type=int, default=0, help="Max depth of rays")
    p.add_argument("--num-samples", type=int, default=0, help="Samples per pixel")
    p.add_argument("--env-map", default="", help="Environment map file")
    # TPU-native extensions:
    p.add_argument("--seed", type=int, default=0, help="Render seed")
    p.add_argument("--spp-per-step", type=int, default=0,
                   help="Samples per jitted device step (default: auto)")
    p.add_argument("--devices", type=int, default=0,
                   help="Image-tile devices (default: all)")
    p.add_argument("--spp-devices", type=int, default=1,
                   help="Sample-sharding devices (mesh second axis)")
    p.add_argument("--intersector",
                   choices=["auto", "bvh", "brute", "pallas", "pallas_brute"],
                   default="auto")
    p.add_argument("--pool", action="store_true",
                   help="EXPERIMENTAL, measured >12x SLOWER than the default "
                        "batched scheduler on TPU (scatter-based queue "
                        "flushes serialize; see ARCHITECTURE.md 'Pool vs "
                        "batch'). Kept as the CPU reference of the "
                        "stream-compaction queue semantics; implies no "
                        "debug layers")
    p.add_argument("--pool-fraction", type=float, default=0.5)
    p.add_argument("--compact", choices=["auto", "off", "refill"],
                   default="auto",
                   help="Dead-lane scheduling: 'auto' slices the sorted "
                        "wavefront to calibrated per-bounce lane budgets; "
                        "'refill' runs the cross-sample sorted-ring "
                        "scheduler — EXPERIMENTAL, measured 1.45x SLOWER "
                        "than 'auto' (sorts every living lane every wave: "
                        "4.45 vs 3.3 sorts/path, ARCHITECTURE.md refill "
                        "entry); kept as the measured answer to 'why not a "
                        "persistent wavefront'. Pallas path, no debug "
                        "layers; falls back silently elsewhere; overflow "
                        "triggers an uncompacted re-render")
    p.add_argument("--layer", type=_layer_arg, default=0,
                   help="Output layer: index or probe name (beauty, "
                        "normal, depth, ... — any name registered via "
                        "ops/probes.register)")
    p.add_argument("--mode", default="mean",
                   choices=["mean", "variance", "first", "last", "count",
                            "weight", "hash", "naninf"])
    p.add_argument("--preview-port", type=int, default=0,
                   help="Serve a live HTTP preview on this port (with --debug)")
    p.add_argument("--preview-file", default="",
                   help="Write periodic snapshot to this file (with --debug)")
    p.add_argument("--preview-every", type=float, default=2.0,
                   help="Snapshot period in seconds")
    p.add_argument("--converge-se", type=float, default=0.0,
                   help="With --continious: stop when the MEDIAN per-pixel "
                        "standard error of the beauty mean drops below this "
                        "(median, not mean: firefly samples make the mean SE "
                        "non-convergent)")
    p.add_argument("--checkpoint", default="",
                   help="Checkpoint file; saved periodically and on exit")
    p.add_argument("--resume", action="store_true",
                   help="Resume accumulation from --checkpoint")
    p.add_argument("--oracle", action="store_true",
                   help="Render with the independent CPU reference implementation")
    p.add_argument("--debug-nans", action="store_true",
                   help="Enable jax_debug_nans (NaN-origin tracing)")
    p.add_argument("--profile-dir", default="",
                   help="Capture a jax.profiler device trace into this dir")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = (lambda *a: None) if args.quiet else print

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf, images, writers
    from raytracer_odin_tpu.models import build as build_mod
    from raytracer_odin_tpu.models.scene import HostTexture

    t0 = time.perf_counter()
    host = gltf.read_gltf(args.input_file)
    log(f"Scene loaded: {host.num_triangles} triangles, "
        f"{len(host.materials)} materials, {len(host.textures)} textures "
        f"({time.perf_counter() - t0:.2f}s)")

    env_tex = None
    if args.env_map:
        li = images.load_image(args.env_map)
        env_tex = HostTexture(li.data, li.is_hdr)

    # Config resolution (defaults applied like main.odin:199-212).
    width = args.width or 512
    height = args.height or 512
    fov_x = host.cam.fov_x
    if args.height:
        fov_x *= width / height
    elif width != height:
        fov_x *= width / height
    depth = args.ray_depth or 8
    samples = args.num_samples or 64

    spp_step = args.spp_per_step
    if spp_step <= 0:
        # Auto: keep device steps ~short; divide the sample count evenly.
        spp_step = 4
        while samples % spp_step:
            spp_step -= 1
    cfg = RenderConfig(
        width=width, height=height, ray_depth=depth, samples=samples,
        continuous=args.continious, samples_per_step=spp_step,
        seed=args.seed, debug_features=args.debug and not args.pool,
        intersector=args.intersector,
        wavefront_pool=args.pool, pool_fraction=args.pool_fraction,
        compact=args.compact,
    )

    scene = build_mod.finish_scene(host, env_map=env_tex, verbose=not args.quiet)

    if args.oracle:
        from raytracer_odin_tpu.oracle import cpu_reference as oracle
        from raytracer_odin_tpu.render import accum, output

        t0 = time.perf_counter()
        img = oracle.render(scene, width, height, fov_x, depth, samples,
                            seed=args.seed)
        log(f"Oracle rendered in {time.perf_counter() - t0:.2f}s")
        rgb = output.tone_map_aces(np.maximum(np.nan_to_num(img), 0))
        rgb = np.clip(np.round(rgb ** (1 / 2.2) * 255), 0, 255).astype(np.uint8)
        if args.output_file:
            writers.save_image(args.output_file, rgb)
            log(f"Saved {args.output_file}")
        return 0

    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.render import accum, checkpoint, output, preview, runtime
    from raytracer_odin_tpu.parallel import mesh as pmesh

    n_dev_avail = len(jax.devices())
    n_spp_dev = max(1, args.spp_devices)
    n_tile = args.devices or max(1, n_dev_avail // n_spp_dev)
    use_mesh = n_tile * n_spp_dev > 1

    interrupt = runtime.InterruptFlag().install()

    initial_stats = None
    initial_samples = 0
    if args.resume and args.checkpoint and checkpoint.exists(args.checkpoint):
        initial_stats, initial_samples, meta = checkpoint.load(args.checkpoint)
        log(f"Resumed {initial_samples} samples from {args.checkpoint}")

    # Preview / hooks.
    hooks = []
    pv = None
    if args.debug:
        flat = scene.bvh
        pv = preview.Preview(
            np.asarray(scene.cam_pos), np.asarray(scene.cam_basis), fov_x,
            (width, height), flat_bvh=flat, scene=scene, ray_depth=depth,
        )
        if args.preview_port:
            port = pv.serve(args.preview_port)
            log(f"Preview at http://127.0.0.1:{port}/")
        if args.preview_file:
            hooks.append(preview.SnapshotWriter(
                pv, args.preview_file, args.preview_every,
                layer=args.layer, mode=args.mode,
            ))
        else:
            hooks.append(lambda s, n: pv.update(s, n))
    ckpt_state = {"last": time.time()}
    if args.checkpoint:
        def ckpt_hook(stats, samples_done):
            now = time.time()
            if now - ckpt_state["last"] > 30:
                ckpt_state["last"] = now
                checkpoint.save(args.checkpoint, stats, samples_done)
        hooks.append(ckpt_hook)

    def on_step(stats, samples_done):
        stats = accum.crop(stats, height, width)
        for h in hooks:
            h(stats, samples_done)

    trials = args.times if args.times > 0 else 1

    step_fn = None
    make_stats = None
    if use_mesh:
        mesh = pmesh.make_mesh(n_tile=n_tile, n_spp=n_spp_dev)
        scene = pmesh.replicate_scene(scene, mesh)
        sharded = pmesh.make_sharded_render_step(cfg, fov_x, mesh, scene)
        step_fn = sharded
        # Rows are padded to the tile axis internally; the user's resolution
        # is never changed (crop at every readout below).
        h_pad = pmesh.padded_height(height, n_tile)
        make_stats = lambda: accum.init_stats(  # noqa: E731
            cfg.num_layers, h_pad, width
        )
        if initial_stats is not None:
            initial_stats = accum.pad_rows(initial_stats, h_pad)
        log(f"Mesh: {n_tile} tile x {n_spp_dev} spp devices"
            + (f" (rows padded {height} -> {h_pad})" if h_pad != height else ""))

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import contextlib

    from raytracer_odin_tpu.utils import profiling

    prof = (
        profiling.trace(args.profile_dir)
        if args.profile_dir
        else contextlib.nullcontext()
    )
    with prof:
        res = runtime.render_scene(
            scene, cfg, fov_x, trials=trials,
            interrupt=interrupt, on_step=on_step if hooks else None,
            step_fn=step_fn, make_stats=make_stats,
            initial_stats=initial_stats, initial_samples=initial_samples,
            verbose=not args.quiet, converge_se=args.converge_se,
        )
    res.stats = accum.crop(res.stats, height, width)
    interrupt.uninstall()
    if not args.quiet and res.trial_seconds:
        # Measured path segments (same accounting as bench.py), not
        # depth * pixels.
        mrays = res.rays_cast / max(sum(res.trial_seconds), 1e-9) / 1e6
        print(f"Throughput: {mrays:.2f} Mrays/s "
              f"({res.rays_cast / 1e6:.1f}M rays cast)")

    if args.checkpoint:
        checkpoint.save(args.checkpoint, res.stats, res.samples_done)
        log(f"Checkpoint saved to {args.checkpoint}")

    if args.output_file:
        img = output.layer_to_rgb(res.stats, args.layer, args.mode)
        writers.save_image(args.output_file, img)
        log(f"Saved {args.output_file} ({res.samples_done} spp)")

    if pv:
        pv.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
