"""Image codec tests: PNG/HDR/PPM round trips, native-vs-python unfilter
parity, PIL cross-checks of the from-scratch PNG decoder."""

import io
from pathlib import Path

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


def _test_photo(h=40, w=56):
    """Smooth synthetic 'photo' (JPEG-friendly: no hard edges, so decoder
    differences are sub-quantization)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
    g = 128 + 70 * np.cos(xx / 13.0 + 1.0)
    b = 128 + 80 * np.sin((xx + yy) / 11.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _pil_jpeg(img, **kw):
    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.fromarray(img if img.ndim == 3 else img).save(
        buf, format="JPEG", **kw
    )
    return buf.getvalue()


def test_jpeg_from_scratch_matches_pil():
    """Our baseline JPEG decoder vs PIL's, across quality and subsampling
    (4:4:4, 4:2:2, 4:2:0) on non-multiple-of-16 dimensions."""
    import PIL.Image
    from raytracer_odin_tpu.io import jpeg

    img = _test_photo()
    for quality, subsampling in [(95, 0), (85, 1), (75, 2)]:
        data = _pil_jpeg(img, quality=quality, subsampling=subsampling)
        ours = jpeg.decode(data).astype(np.float64)
        pil = np.asarray(PIL.Image.open(io.BytesIO(data))).astype(np.float64)
        # Luma is upsampling-free: near-exact. Chroma differs by PIL's
        # fancy upsampling vs our replication; compare means + Y plane.
        y_ours = ours @ [0.299, 0.587, 0.114]
        y_pil = pil @ [0.299, 0.587, 0.114]
        assert np.abs(y_ours - y_pil).mean() < 1.0, (quality, subsampling)
        assert np.abs(ours - pil).mean() < 3.0, (quality, subsampling)
        assert np.abs(ours.mean(axis=(0, 1)) - pil.mean(axis=(0, 1))).max() < 1.0


def test_jpeg_grayscale_and_restart():
    import PIL.Image
    from raytracer_odin_tpu.io import jpeg

    img = _test_photo()[:, :, 1]
    data = _pil_jpeg(img, quality=90, restart_marker_blocks=2)
    ours = jpeg.decode(data)
    assert ours.shape == (img.shape[0], img.shape[1], 1)
    pil = np.asarray(PIL.Image.open(io.BytesIO(data))).astype(np.float64)
    assert np.abs(ours[..., 0].astype(np.float64) - pil).mean() < 1.0


def test_jpeg_progressive_raises_and_falls_back():
    import unittest.mock

    import PIL.Image
    from raytracer_odin_tpu.io import jpeg

    img = _test_photo()
    data = _pil_jpeg(img, quality=90, progressive=True)
    with pytest.raises(jpeg.JpegError):
        jpeg.decode(data)
    # decode_image falls back to PIL transparently — spy proves the fallback
    # actually triggered (not a silent from-scratch decode of garbage).
    with unittest.mock.patch.object(
        PIL.Image, "open", wraps=PIL.Image.open
    ) as spy:
        li = images.decode_image(data)
    assert spy.call_count == 1
    assert li.data.shape == img.shape
    pil = np.asarray(PIL.Image.open(io.BytesIO(data))).astype(np.float32) / 255.0
    assert np.array_equal(li.data, pil)


def test_png_interlaced_fails_loudly():
    """Adam7-interlaced PNG is out of scope (stb handles it natively,
    textures.odin:37-52); we must refuse it with a clear error rather than
    decode the interlaced scanlines as sequential rows."""
    img = np.random.default_rng(7).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    data = bytearray(png.encode(img))
    # IHDR payload starts at byte 16; interlace flag is its 13th byte.
    assert data[12:16] == b"IHDR"
    data[16 + 12] = 1
    import struct, zlib

    crc = zlib.crc32(bytes(data[12:29])) & 0xFFFFFFFF
    data[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="interlaced"):
        png.decode(bytes(data))


def test_textured_scene_builds_without_pil(tmp_path):
    """BASELINE config 3 ships a JPEG floor texture (assets.py cfg3); the
    whole generate -> glTF ingest -> decode chain must work with PIL absent
    (VERDICT r2 item 7 done-criterion). Encoder and decoder are both the
    from-scratch io/jpeg.py codec."""
    import unittest.mock

    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets

    with unittest.mock.patch.dict(
        "sys.modules", {"PIL": None, "PIL.Image": None}
    ):
        info = assets.generate("textured", tmp_path)
        text = Path(info["gltf"]).read_text()
        assert "data:image/jpeg" in text  # the scene really carries a JPEG
        host = gltf.read_gltf(info["gltf"])
    assert len(host.textures) >= 2  # JPEG checker + PNG/normal maps
    # The JPEG checker is LDR RGB: present and plausibly decoded.
    assert any(
        not t.is_hdr and t.data.shape[-1] == 3 and 0.0 < t.data.mean() < 1.0
        for t in host.textures
    )


def test_jpeg_decode_image_uses_from_scratch():
    """decode_image must handle baseline JPEG without PIL in the loop."""
    import unittest.mock

    img = _test_photo()
    data = _pil_jpeg(img, quality=92)
    with unittest.mock.patch.dict("sys.modules", {"PIL": None, "PIL.Image": None}):
        li = images.decode_image(data)
    assert li.data.shape == img.shape
    assert abs(float(li.data.mean() * 255) - img.mean()) < 1.5


def test_jpeg_encoder_roundtrip():
    """Our encoder's bytes decode correctly through BOTH our decoder and
    PIL (proving the bitstream is spec-conformant, not just self-consistent)."""
    import PIL.Image
    from raytracer_odin_tpu.io import jpeg

    img = _test_photo()
    data = jpeg.encode(img, quality=92)
    ours = jpeg.decode(data).astype(np.float64)
    assert ours.shape == img.shape
    mse = ((ours - img) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 35, psnr
    pil = np.asarray(PIL.Image.open(io.BytesIO(data))).astype(np.float64)
    # Same bitstream, same pixels up to decoder IDCT rounding: T.81 A.3.3
    # allows +-1 per sample in the IDCT stage and the YCbCr->RGB rounding
    # can add one more (ours is float64; libjpeg is fixed-point).
    assert np.abs(ours - pil).max() <= 2.0
    assert np.abs(ours - pil).mean() < 0.5


def test_jpeg_encoder_gray_and_odd_sizes():
    from raytracer_odin_tpu.io import jpeg

    img = _test_photo(h=17, w=23)[:, :, 0]
    data = jpeg.encode(img, quality=95)
    back = jpeg.decode(data)
    assert back.shape == (17, 23, 1)
    assert np.abs(back[..., 0].astype(np.float64) - img).mean() < 3.0
