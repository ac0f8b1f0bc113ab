"""Image codec tests: PNG/HDR/PPM round trips, native-vs-python unfilter
parity, PIL cross-checks of the from-scratch PNG decoder."""

import io

import numpy as np
import pytest

from raytracer_odin_tpu.io import hdr, images, png, writers


def test_png_roundtrip_rgb():
    img = np.random.default_rng(0).integers(0, 256, (33, 47, 3)).astype(np.uint8)
    assert np.array_equal(png.decode(png.encode(img)), img)


def test_png_roundtrip_rgba_gray():
    rng = np.random.default_rng(1)
    for ch in (1, 2, 4):
        img = rng.integers(0, 256, (9, 13, ch)).astype(np.uint8)
        assert np.array_equal(png.decode(png.encode(img)), img)


def test_png_decode_matches_pil_filtered():
    """PIL encodes with adaptive filters (sub/up/avg/paeth) — decoding its
    output exercises every unfilter path against an independent codec."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(2)
    # smooth gradient + noise encourages varied filter choice
    base = np.linspace(0, 255, 64 * 64 * 3).reshape(64, 64, 3)
    img = np.clip(base + rng.normal(0, 8, base.shape), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="PNG", optimize=True)
    assert np.array_equal(png.decode(buf.getvalue()), img)


def test_png_unfilter_native_matches_python():
    from raytracer_odin_tpu.io import native
    lib = native.load()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    h, stride, bpp = 16, 60, 3
    raw = rng.integers(0, 256, (h, 1 + stride)).astype(np.uint8)
    raw[:, 0] = rng.integers(0, 5, h)  # filter types 0-4
    py = png._unfilter_py(raw, h, stride, bpp)
    out = np.zeros((h, stride), np.uint8)
    lib.png_unfilter(np.ascontiguousarray(raw), out, h, stride, bpp)
    assert np.array_equal(py, out)


def test_png_16bit_and_palette_via_pil():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(4)
    img16 = rng.integers(0, 65536, (8, 8)).astype(np.uint16)
    buf = io.BytesIO()
    PIL.fromarray(img16, mode="I;16").save(buf, format="PNG")
    dec = png.decode(buf.getvalue())
    assert dec.shape == (8, 8, 1)
    assert np.array_equal(dec[..., 0], (img16 >> 8).astype(np.uint8))
    # palette
    imgp = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(imgp).convert("P", palette=PIL.Palette.ADAPTIVE).save(buf, "PNG")
    dec = png.decode(buf.getvalue())
    ref = np.asarray(PIL.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(dec[..., :3], ref)


def test_hdr_roundtrip():
    f = np.random.default_rng(5).uniform(0, 50, (16, 24, 3)).astype(np.float32)
    d = hdr.decode(hdr.encode(f))
    rel = np.abs(d - f) / np.maximum(f.max(axis=-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01  # 8-bit mantissa quantization


def test_hdr_rle_decode():
    """Wide images use new-style RLE on encode-by-others; craft one by hand."""
    w, h = 16, 2
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = 128
    rgbe[..., 3] = 128  # value = mant * 2^(e-136) = 128 * 2^-8 = 0.5
    header = b"#?RADIANCE\n\n" + f"-Y {h} +X {w}\n".encode()
    # new RLE scanline: (2,2,hi,lo) + per channel: run of w
    lines = b""
    for _ in range(h):
        lines += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            lines += bytes([128 + w, int(rgbe[0, 0, c])])
    img = hdr.decode(header + lines)
    assert img.shape == (h, w, 3)
    assert np.allclose(img, 0.5, atol=1e-6)


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(6).integers(0, 256, (10, 12, 3)).astype(np.uint8)
    writers.save_image(tmp_path / "a.ppm", img)
    back = images.load_image(tmp_path / "a.ppm")
    assert np.array_equal((back.data * 255).round().astype(np.uint8), img)


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError, match="Unsupported file format"):
        writers.save_image(tmp_path / "a.bmp", np.zeros((2, 2, 3), np.uint8))


def test_jpeg_decode_via_pil():
    PIL = pytest.importorskip("PIL.Image")
    img = np.full((16, 16, 3), 128, np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=95)
    li = images.decode_image(buf.getvalue())
    assert li.data.shape == (16, 16, 3)
    assert abs(float(li.data.mean()) - 128 / 255) < 0.02
