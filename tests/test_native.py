"""Native loader: decode/resize parity vs PIL, prefetcher ordering."""
import io

import numpy as np
import pytest
from PIL import Image

from boxfusion_tpu.native import Prefetcher, get_loader

nl = get_loader()
needs_native = pytest.mark.skipif(nl is None, reason="native loader unavailable")


@needs_native
def test_decode_png_rgb8():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    got = nl.decode_png(buf.getvalue())
    np.testing.assert_array_equal(got, img)


@needs_native
def test_decode_png_u16_depth():
    rng = np.random.RandomState(1)
    img = (rng.rand(24, 31) * 60000).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    got = nl.decode_png(buf.getvalue())
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)


@needs_native
def test_decode_jpeg():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (40, 60, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    got = nl.decode_jpeg(buf.getvalue())
    assert got.shape == (40, 60, 3)
    want = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0


def _np_bilinear(img, dh, dw):
    """cv2-convention bilinear (half-pixel centers, clamped edges)."""
    sh, sw = img.shape[:2]
    fy = (np.arange(dh) + 0.5) * sh / dh - 0.5
    fx = (np.arange(dw) + 0.5) * sw / dw - 0.5
    y0 = np.clip(np.floor(fy), 0, sh - 1).astype(int)
    x0 = np.clip(np.floor(fx), 0, sw - 1).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None]
    wx = np.clip(fx - x0, 0, 1)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    a = img[np.ix_(y0, x0)].astype(np.float64)
    b = img[np.ix_(y0, x1)].astype(np.float64)
    c = img[np.ix_(y1, x0)].astype(np.float64)
    d = img[np.ix_(y1, x1)].astype(np.float64)
    return (a * (1 - wx) + b * wx) * (1 - wy) + (c * (1 - wx) + d * wx) * wy


@needs_native
def test_resize_parity():
    rng = np.random.RandomState(3)
    # downscale vs a numpy model of cv2-convention bilinear (the reference
    # used cv2.resize; PIL's BILINEAR antialiases on downscale so it is not
    # the golden here)
    img = rng.randint(0, 255, (48, 64, 3), np.uint8)
    got = nl.resize_rgb(img, (32, 24)).astype(float)
    want = _np_bilinear(img, 24, 32)
    assert np.max(np.abs(got - want)) <= 1.0  # u8 truncation

    d = rng.rand(48, 64).astype(np.float32)
    got = nl.resize_f32(d, (32, 24))
    want = _np_bilinear(d, 24, 32)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # upscale also matches
    got_up = nl.resize_f32(d, (128, 96))
    want_up = _np_bilinear(d, 96, 128)
    np.testing.assert_allclose(got_up, want_up, atol=1e-5)


def test_prefetcher_preserves_order():
    items = list(range(50))
    out = list(Prefetcher(items, depth=4))
    assert out == items


def test_corrupt_jpeg_raises_instead_of_exiting():
    """libjpeg fatal errors must come back as ValueError (setjmp path), not
    kill the process via the default error_exit."""
    from boxfusion_tpu.native.loader import get_loader

    nl = get_loader()
    if nl is None:
        import pytest

        pytest.skip("native loader unavailable")
    import pytest

    with pytest.raises(ValueError):
        nl.decode_jpeg(b"\xff\xd8\xff\xe0garbage-not-a-jpeg")


def test_prefetcher_propagates_producer_error():
    from boxfusion_tpu.native.loader import Prefetcher

    def gen():
        yield 1
        raise IOError("decode failed")

    import pytest

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="prefetch producer"):
        list(it)


def test_read_lines_single_line(tmp_path):
    from boxfusion_tpu.utils.config import read_lines

    p = tmp_path / "one.txt"
    p.write_text("scene0011_00\n")
    assert read_lines(str(p)) == ["scene0011_00"]
    p.write_text("a#b\nc\n\n")  # '#' must not be treated as a comment
    assert read_lines(str(p)) == ["a#b", "c"]
