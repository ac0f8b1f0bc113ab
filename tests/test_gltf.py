"""glTF ingest tests: generated-scene round trips, transform accumulation,
cofactor normal transform, material/emissive-strength semantics."""

import json
import math

import numpy as np
import pytest

from raytracer_odin_tpu.io import gltf
from raytracer_odin_tpu.models import assets


def test_cube_scene_counts(cube_scene):
    host, dev = cube_scene
    assert host.num_triangles == 16  # 12 cube + 2 floor + 2 light
    assert dev.light_p.shape[0] == 2  # emissive quad
    assert len(host.materials) == 3


def test_camera_extraction(cube_scene):
    host, _ = cube_scene
    assert np.allclose(host.cam.pos, [2.5, 1.8, 2.5], atol=1e-5)
    # forward column points at the target
    fwd = host.cam.basis[:, 2]
    want = np.array([0, 0.5, 0]) - host.cam.pos
    want /= np.linalg.norm(want)
    assert np.allclose(fwd, want, atol=1e-5)
    assert abs(host.cam.fov_x - 0.9) < 1e-6


def test_emissive_strength_applied(cube_scene):
    host, _ = cube_scene
    emis = [m for m in host.materials if np.abs(m.emission_factor).sum() > 0]
    assert len(emis) == 1
    assert np.allclose(emis[0].emission_factor, [12, 12, 12])


def test_nested_transforms_and_normals(tmp_path):
    """Child node under a scaled+rotated parent: positions via full chain,
    normals via cofactor (non-uniform scale breaks naive rotation)."""
    b = assets.GltfBuilder()
    m = b.add_material()
    p, n, uv, i = assets.quad_mesh((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))
    mesh = b.add_mesh(p, i, n, uv, material=m)
    # parent: non-uniform scale; child: translate
    b.nodes.append({"scale": [2.0, 0.5, 1.0], "children": [1]})
    b.nodes.append({"mesh": mesh, "translation": [1, 1, 0]})
    b.scene_nodes = [0]
    path = tmp_path / "t.gltf"
    b.write(path)
    s = gltf.read_gltf(path)
    assert s.num_triangles == 2
    # corner p0 = (0,0,0) -> child translate -> (1,1,0) -> scale -> (2, .5, 0)
    assert np.allclose(s.p[0], [2, 0.5, 0], atol=1e-6)
    # flat quad normal (-y for this winding) survives cofactor + renormalize
    assert np.allclose(s.n1[0], [0, -1, 0], atol=1e-6)
    assert np.allclose(s.ng[0], [0, -1, 0], atol=1e-6)


def test_no_normals_uses_flat_ng(tmp_path):
    b = assets.GltfBuilder()
    m = b.add_material()
    p, n, uv, i = assets.quad_mesh((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))
    b.add_node(mesh=b.add_mesh(p, i, normals=None, uvs=None, material=m))
    path = tmp_path / "nn.gltf"
    b.write(path)
    s = gltf.read_gltf(path)
    assert np.allclose(s.n1, np.repeat(s.ng[:, None], 1, 1).reshape(-1, 3), atol=1e-6)


def test_missing_position_raises(tmp_path, scene_dir):
    info = assets.generate("cube", scene_dir)
    doc = json.load(open(info["gltf"]))
    del doc["meshes"][0]["primitives"][0]["attributes"]["POSITION"]
    bad = tmp_path / "bad.gltf"
    bad.write_text(json.dumps(doc))
    with pytest.raises(gltf.GltfError, match="No position accessor"):
        gltf.read_gltf(bad)


def test_texture_cache_dedup(tmp_path):
    """The same image referenced twice must load once (input.odin:66-68)."""
    b = assets.GltfBuilder()
    tex = b.add_image_png(assets.checker_texture(8))
    m1 = b.add_material(color_tex=tex)
    m2 = b.add_material(emissive_tex=tex, emissive=(1, 1, 1))
    p, n, uv, i = assets.quad_mesh((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))
    b.add_node(mesh=b.add_mesh(p, i, n, uv, material=m1))
    b.add_node(mesh=b.add_mesh(p, i, n, uv, material=m2))
    path = tmp_path / "tc.gltf"
    b.write(path)
    s = gltf.read_gltf(path)
    assert len(s.textures) == 1
    assert s.materials[0].color_tex == 0
    assert s.materials[1].emission_tex == 0


def test_scene_selection_fallbacks(tmp_path):
    b = assets.GltfBuilder()
    m = b.add_material()
    p, n, uv, i = assets.quad_mesh((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))
    b.add_node(mesh=b.add_mesh(p, i, n, uv, material=m))
    path = tmp_path / "s.gltf"
    b.write(path)
    doc = json.loads(path.read_text())
    # no "scene" key -> scenes[0]
    del doc["scene"]
    path.write_text(json.dumps(doc))
    assert gltf.read_gltf(path).num_triangles == 2
    # no scenes at all -> walk all nodes
    del doc["scenes"]
    path.write_text(json.dumps(doc))
    assert gltf.read_gltf(path).num_triangles == 2


def test_interleaved_accessors(tmp_path):
    """byteStride > item size (interleaved vertex buffers)."""
    import base64, struct
    # two vertices interleaved: pos(12B) + normal(12B), stride 24
    verts = [((0, 0, 0), (0, 1, 0)), ((1, 0, 0), (0, 1, 0)), ((0, 0, 1), (0, 1, 0))]
    buf = b""
    for pos, nrm in verts:
        buf += struct.pack("<3f", *pos) + struct.pack("<3f", *nrm)
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1}}]}],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 3, "type": "VEC3"},
        ],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(buf), "byteStride": 24}],
        "buffers": [{"byteLength": len(buf), "uri": "data:application/octet-stream;base64," + base64.b64encode(buf).decode()}],
    }
    path = tmp_path / "inter.gltf"
    path.write_text(json.dumps(doc))
    s = gltf.read_gltf(path)
    assert s.num_triangles == 1
    assert np.allclose(s.p[0], [0, 0, 0])
    assert np.allclose(s.n1[0], [0, 1, 0])


def test_sparse_accessor_patches_base(tmp_path):
    """Sparse accessors substitute (index, value) pairs over the base data
    (cgltf resolves these inside accessor_read_float, input.odin:171-224).
    A triangle whose POSITION accessor sparsely patches vertex 1 must come
    out with the patched coordinate, not the base buffer's."""
    import base64
    import struct

    base = struct.pack("<9f", 0, 0, 0, 9, 9, 9, 0, 0, 1)  # v1 is wrong in base
    patch_idx = struct.pack("<H", 1)
    patch_val = struct.pack("<3f", 1, 0, 0)
    buf = base + patch_idx + b"\x00\x00" + patch_val  # pad to 4-align values
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 3,
                "type": "VEC3",
                "sparse": {
                    "count": 1,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 2},
            {"buffer": 0, "byteOffset": 40, "byteLength": 12},
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }
        ],
    }
    path = tmp_path / "sparse.gltf"
    path.write_text(json.dumps(doc))
    s = gltf.read_gltf(path)
    assert s.num_triangles == 1
    # p + u = second corner = the sparse-patched vertex (1, 0, 0)
    assert np.allclose(s.p[0] + s.u[0], [1, 0, 0], atol=1e-6)
    assert not np.allclose(s.p[0] + s.u[0], [9, 9, 9])


def test_sparse_accessor_without_bufferview(tmp_path):
    """Spec: a sparse accessor may omit bufferView entirely (base = zeros)."""
    import base64
    import struct

    patch_idx = struct.pack("<3H", 0, 1, 2)
    patch_val = struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 0, 1)
    buf = patch_idx + b"\x00\x00" + patch_val
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "accessors": [
            {
                "componentType": 5126,
                "count": 3,
                "type": "VEC3",
                "sparse": {
                    "count": 3,
                    "indices": {"bufferView": 0, "componentType": 5123},
                    "values": {"bufferView": 1},
                },
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 6},
            {"buffer": 0, "byteOffset": 8, "byteLength": 36},
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }
        ],
    }
    path = tmp_path / "sparse0.gltf"
    path.write_text(json.dumps(doc))
    s = gltf.read_gltf(path)
    assert np.allclose(s.p[0], [0, 0, 0], atol=1e-6)
    assert np.allclose(s.p[0] + s.u[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(s.p[0] + s.v[0], [0, 0, 1], atol=1e-6)


def test_matrix_node_transform(tmp_path):
    """Node with a raw column-major matrix property."""
    b = assets.GltfBuilder()
    m = b.add_material()
    p, n, uv, i = assets.quad_mesh((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))
    mesh = b.add_mesh(p, i, n, uv, material=m)
    # translation (3,4,5) as column-major matrix
    mat = [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 3, 4, 5, 1]
    b.nodes.append({"mesh": mesh, "matrix": mat})
    b.scene_nodes = [0]
    path = tmp_path / "mat.gltf"
    b.write(path)
    s = gltf.read_gltf(path)
    assert np.allclose(s.p[0], [3, 4, 5], atol=1e-6)


def test_generated_meshes_wind_outward():
    """Closed procedural meshes must have outward geometric normals, or the
    renderer's inside-flip (raytracer.odin:485-488) inverts their shading."""
    from raytracer_odin_tpu.models.assets import box_mesh, uv_sphere

    for p, n, uv, idx in [uv_sphere(1.0, (0, 0, 0)), box_mesh((2, 2, 2), (0, 0, 0))]:
        tri = idx.reshape(-1, 3)
        pos = p[tri]
        ng = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
        norms = np.linalg.norm(ng, axis=-1)
        ok = norms > 1e-12
        ng = ng[ok] / norms[ok, None]
        centers = pos[ok].mean(axis=1)
        outward = (ng * centers).sum(-1)
        assert (outward > 0).all()
