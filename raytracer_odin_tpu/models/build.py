"""Scene finalization + device upload.

`finish_scene` (raytracer.odin:62-91) equivalent: collect emissive triangles
into the light list, build the flattened BVH (triangles re-ordered to match
leaf ranges), pack the texture atlas, and assemble the DeviceScene pytree of
jnp arrays.
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from raytracer_odin_tpu.models.scene import (
    DeviceBVH,
    DeviceScene,
    HostMaterial,
    HostScene,
    HostTexture,
)
from raytracer_odin_tpu.ops import bvh as bvh_mod
from raytracer_odin_tpu.ops import light_cull
from raytracer_odin_tpu.ops import texture as texture_mod
from raytracer_odin_tpu.ops.geometry import aabb_of_triangles

EMISSIVE_EPS = 1e-6  # raytracer.odin:64


def finish_scene(host: HostScene, env_map: HostTexture | None = None,
                 verbose: bool = False) -> DeviceScene:
    """Build light list + BVH and upload everything as a DeviceScene."""
    n_tri = host.num_triangles

    # Emissive-material mask per triangle (raytracer.odin:63-66).
    if host.materials:
        mat_emission = np.stack([m.emission_factor for m in host.materials])
    else:
        mat_emission = np.zeros((1, 3), np.float32)
        host.materials = [HostMaterial()]
    emissive_mat = np.abs(mat_emission).sum(axis=1) > EMISSIVE_EPS
    light_sel = emissive_mat[host.mat_index] if n_tri else np.zeros(0, bool)

    light_p = host.p[light_sel]
    light_u = host.u[light_sel]
    light_v = host.v[light_sel]
    light_ng = host.ng[light_sel]
    # Morton-order the light list so consecutive lights are spatial
    # neighbours: the basis of the many-light cluster cull
    # (ops/light_cull.py, the TPU analogue of the reference's light BVH,
    # shading.odin:62-94). Light order is free to permute — sampling picks
    # uniformly and the pdf is a sum.
    order = light_cull.morton_order(
        light_p + (light_u + light_v) / 3.0
    )
    light_p = light_p[order]
    light_u = light_u[order]
    light_v = light_v[order]
    light_ng = light_ng[order]
    cross = np.cross(light_u, light_v)
    area2 = np.linalg.norm(cross, axis=-1)  # |cross| = 2 * area
    light_pdf_factor = 2.0 / np.where(area2 > 0, area2, 1.0)
    light_rows = light_cull.pack_light_rows(
        light_p, light_u, light_v, light_ng, light_pdf_factor
    )
    lcl_lo, lcl_hi = light_cull.light_cluster_aabbs(light_rows)

    # Main BVH (the light "BVH" role — bounding the light-pdf walk — is
    # covered by the chunked brute-force sweep in ops/shading.light_pdf_sum,
    # which is the TPU-regular replacement of shading.odin:62-94).
    t0 = time.perf_counter()
    lo, hi = aabb_of_triangles(host.p, host.u, host.v)
    flat = bvh_mod.build_flat_bvh(lo, hi)
    if verbose:
        print(f"Scene BVH built in {time.perf_counter() - t0:.3f}s "
              f"({flat.num_nodes} nodes over {n_tri} triangles)")

    perm = flat.perm if n_tri else np.zeros(0, np.int64)

    # Permute triangles into BVH leaf order.
    def g(a):
        return np.asarray(a)[perm] if n_tri else np.asarray(a)

    tri_n = np.stack([g(host.n1), g(host.n2), g(host.n3)], axis=1) if n_tri else np.zeros((0, 3, 3), np.float32)
    tri_tex = np.stack([g(host.tex1), g(host.tex2), g(host.tex3)], axis=1) if n_tri else np.zeros((0, 3, 2), np.float32)
    tri_tan = np.stack([g(host.tan1), g(host.tan2), g(host.tan3)], axis=1) if n_tri else np.zeros((0, 3, 4), np.float32)

    # Materials SoA.
    mats = host.materials
    mat_color = np.stack([m.color_factor for m in mats]).astype(np.float32)
    mat_emission = np.stack([m.emission_factor for m in mats]).astype(np.float32)
    mat_metallic = np.array([m.metallic_factor for m in mats], np.float32)
    mat_roughness = np.array([m.roughness_factor for m in mats], np.float32)
    mat_tex = np.array(
        [
            [m.color_tex, m.emission_tex, m.metallic_roughness_tex, m.normal_tex]
            for m in mats
        ],
        np.int32,
    )

    # Texture atlas; the env map is appended as one more atlas entry.
    textures = list(host.textures)
    env_tex_id = -1
    if env_map is not None:
        env_tex_id = len(textures)
        textures.append(env_map)
    atlas = texture_mod.build_atlas(textures)

    # Pallas intersector layout: packed triangle rows + treelet-cluster AABBs
    # over the BVH-permuted order (tight clusters for bundle culling).
    from raytracer_odin_tpu.ops import culling as culling_mod
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    ptri = pi.pad_triangles(g(host.p), g(host.u), g(host.v))
    if n_tri:
        plo, phi = aabb_of_triangles(g(host.p), g(host.u), g(host.v))
    else:
        plo = np.zeros((0, 3), np.float32)
        phi = np.zeros((0, 3), np.float32)
    cl_lo, cl_hi = culling_mod.cluster_aabbs(plo, phi)

    # One shading row per triangle: shading attrs + inlined material
    # (materials are per-primitive in the reference, input.odin:161-162, so
    # inlining loses nothing). The layout is scene-specialized: the row
    # gather dominates material-eval cost on TPU, so blocks the scene cannot
    # exercise are not packed. Hit positions come from o + d*t (exact ray
    # algebra). The (name, offset) layout is static pytree aux consumed by
    # ops/integrator._point_material.
    tmat = g(host.mat_index) if n_tri else np.zeros(0, np.int32)
    if n_tri:
        tex_kinds = tuple(bool(k) for k in (mat_tex[tmat] >= 0).any(axis=0))
    else:
        tex_kinds = (False, False, False, False)
    need_tex = any(tex_kinds)
    need_tan = tex_kinds[3]

    blocks = [("ng", 3), ("n", 9)]
    if need_tex:
        blocks.append(("tex", 6))
    if need_tan:
        blocks.append(("tan", 12))
    blocks += [("color", 3), ("emission", 3), ("metallic", 1),
               ("roughness", 1)]
    if need_tex:
        blocks.append(("texids", 4))
    # Triangle geometry (p, u, v) rides the row so the winner's
    # barycentrics can be recomputed per lane at shade time — the Pallas
    # sweep kernel returns only (t, index); selecting u/v in-kernel cost
    # two sublane reduces per cluster test (~15% of the dominant kernel),
    # while widening this already-paid row gather is free (gather cost is
    # per row, indifferent to width — see the consolidation note above).
    blocks += [("tri_p", 3), ("tri_u", 3), ("tri_v", 3)]
    row_spec, off = [], 0
    for name, width in blocks:
        row_spec.append((name, off))
        off += width
    row_width = -(-off // 8) * 8  # pad to a sublane multiple
    row_spec = tuple(row_spec)
    spec = dict(row_spec)

    # Everything a hit needs rides ONE f32 row: TPU gathers pay a large
    # per-gather cost, so consolidation wins — splitting corner uvs into a
    # second gather of the same index measured 526 vs 402 ms/step on the
    # 1080p demo, and f16/bf16 rows measured 516 (gathers move 32-bit
    # lanes; narrow dtypes decompose instead of halving traffic).
    shade_row = np.zeros((n_tri, row_width), np.float32)
    if n_tri:
        def put(name, data):
            data = data.reshape(n_tri, -1)
            shade_row[:, spec[name]:spec[name] + data.shape[1]] = data

        put("ng", g(host.ng))
        put("n", tri_n)
        if need_tex:
            put("tex", tri_tex)
        if need_tan:
            put("tan", tri_tan)
        put("color", mat_color[tmat])
        put("emission", mat_emission[tmat])
        put("metallic", mat_metallic[tmat])
        put("roughness", mat_roughness[tmat])
        if need_tex:
            put("texids", mat_tex[tmat].astype(np.float32))
        put("tri_p", g(host.p))
        put("tri_u", g(host.u))
        put("tri_v", g(host.v))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    i32 = lambda a: jnp.asarray(a, jnp.int32)

    return DeviceScene(
        tri_p=f32(g(host.p)),
        tri_u=f32(g(host.u)),
        tri_v=f32(g(host.v)),
        tri_ng=f32(g(host.ng)),
        tri_n=f32(tri_n),
        tri_tex=f32(tri_tex),
        tri_tan=f32(tri_tan),
        tri_mat=i32(g(host.mat_index)),
        mat_color=f32(mat_color),
        mat_emission=f32(mat_emission),
        mat_metallic=f32(mat_metallic),
        mat_roughness=f32(mat_roughness),
        mat_tex=i32(mat_tex),
        # f32 texels: bf16 pages were measured slower (TPU gathers move
        # 32-bit lanes; see the shade_row note above).
        tex_texels=f32(atlas["tex_texels"]),
        # sRGB-sampled kinds are color (0) and emission (1) only; scenes
        # without them skip the decoded pool's HBM entirely.
        tex_texels_srgb=f32(
            texture_mod.srgb_decode_pool(atlas["tex_texels"])
            if (tex_kinds[0] or tex_kinds[1])
            else np.ones((1, 16), np.float32)
        ),
        tex_offset=i32(atlas["tex_offset"]),
        tex_width=i32(atlas["tex_width"]),
        tex_height=i32(atlas["tex_height"]),
        light_p=f32(light_p),
        light_u=f32(light_u),
        light_v=f32(light_v),
        light_ng=f32(light_ng),
        light_pdf_factor=f32(light_pdf_factor),
        light_mask=f32(np.ones(light_p.shape[0], np.float32)),
        light_rows=f32(light_rows),
        light_cluster_lo=f32(lcl_lo),
        light_cluster_hi=f32(lcl_hi),
        ptri=f32(ptri),
        cluster_lo=f32(cl_lo),
        cluster_hi=f32(cl_hi),
        shade_row=f32(shade_row),
        bvh=DeviceBVH(
            lo=f32(flat.lo),
            hi=f32(flat.hi),
            first=i32(flat.first),
            count=i32(flat.count),
            hit_link=i32(flat.hit_link),
            miss_link=i32(flat.miss_link),
        ),
        cam_pos=f32(host.cam.pos),
        cam_basis=f32(host.cam.basis),
        env_tex=int(env_tex_id),
        row_spec=row_spec,
        tex_kinds=tex_kinds,
    )
