"""Native C++ host pipeline: decode/resize/letterbox correctness vs cv2."""

import os
import tempfile

import numpy as np
import pytest

native = pytest.importorskip("yolo_scratch_tpu.data.native")
cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.fixture(scope="module")
def sample_files():
    rng = np.random.RandomState(0)
    img = (rng.rand(53, 71) * 255).astype(np.uint8)
    rgb = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    d = tempfile.mkdtemp()
    png = os.path.join(d, "t.png")
    jpg = os.path.join(d, "t.jpg")
    cjpg = os.path.join(d, "c.jpg")
    cv2.imwrite(png, img)
    cv2.imwrite(jpg, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    cv2.imwrite(cjpg, rgb[..., ::-1])  # cv2 writes BGR
    return {"img": img, "rgb": rgb, "png": png, "jpg": jpg, "cjpg": cjpg}


def test_png_decode_exact(sample_files):
    dec = native.decode_file(sample_files["png"], 1)
    assert np.array_equal(dec[..., 0], sample_files["img"])


def test_jpeg_decode_close(sample_files):
    dec = native.decode_file(sample_files["jpg"], 1)
    err = np.abs(dec[..., 0].astype(int) - sample_files["img"].astype(int)).mean()
    assert err < 4.0  # codec-level tolerance


def test_prepare_batch_matches_cv2_resize(sample_files):
    out, meta, status = native.prepare_batch([sample_files["png"]], 64, channels=1, threads=2)
    assert status.tolist() == [0]
    assert meta[0, 0] == 71 and meta[0, 1] == 53
    ref = cv2.resize(sample_files["img"], (64, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out[0, ..., 0], ref.astype(np.float32) / 255, atol=2 / 255)


def test_letterbox_geometry(sample_files):
    S = 64
    out, meta, status = native.prepare_batch(
        [sample_files["png"]], S, channels=1, letterbox=True, pad_value=114, threads=1
    )
    w, h, scale, px, py = meta[0]
    assert status[0] == 0
    assert scale == pytest.approx(S / 71, rel=1e-5)
    nh = round(53 * scale)
    assert py == (S - nh) // 2 and px == 0
    # padded rows are exactly pad_value
    assert np.allclose(out[0, 0, :, 0], 114 / 255, atol=1e-6)
    # content region is not padding
    assert abs(out[0, S // 2, S // 2, 0] - 114 / 255) > 1e-3


def test_rgb_and_error_paths(sample_files):
    out, meta, status = native.prepare_batch([sample_files["cjpg"]], 32, channels=3, threads=1)
    assert status.tolist() == [0] and out.shape == (1, 32, 32, 3)

    out, meta, status = native.prepare_batch(["/nonexistent.png"], 32, channels=1, threads=1)
    assert status[0] != 0


def test_fast_jpeg_scale(sample_files):
    """JPEG decode-time downscale: same geometry metadata, pixels within a
    small codec tolerance of the full-decode path; PNG byte-identical."""
    from PIL import Image

    # large smooth source so a real M/8 scale kicks in (256 -> 64 uses 2/8)
    y, x = np.mgrid[0:256, 0:256]
    img = ((np.sin(x / 23.0) + np.cos(y / 17.0)) * 60 + 128).astype(np.uint8)
    d = tempfile.mkdtemp()
    big = os.path.join(d, "big.jpg")
    Image.fromarray(img, "L").save(big, quality=95)

    for lb in (False, True):
        slow, ms, s1 = native.prepare_batch([big], 64, channels=1,
                                            letterbox=lb, fast_jpeg=False)
        fast, mf, s2 = native.prepare_batch([big], 64, channels=1,
                                            letterbox=lb, fast_jpeg=True)
        assert s1.tolist() == [0] and s2.tolist() == [0]
        np.testing.assert_array_equal(ms, mf)  # box unmapping unaffected
        assert np.abs(slow - fast).mean() * 255 < 2.0
        assert np.abs(slow - fast).max() * 255 < 16.0

    # PNG has no decode-time scaling: flag must be a no-op
    s, _, _ = native.prepare_batch([sample_files["png"]], 32, channels=1, fast_jpeg=False)
    f, _, _ = native.prepare_batch([sample_files["png"]], 32, channels=1, fast_jpeg=True)
    np.testing.assert_array_equal(s, f)


def test_prepare_batch_u8_matches_f32(sample_files):
    f32, m1, s1 = native.prepare_batch([sample_files["png"]], 64, channels=1)
    u8, m2, s2 = native.prepare_batch([sample_files["png"]], 64, channels=1, dtype="uint8")
    assert u8.dtype == np.uint8 and s2.tolist() == [0]
    np.testing.assert_allclose(u8[0, ..., 0] / 255.0, f32[0, ..., 0], atol=1 / 255)
    np.testing.assert_array_equal(m1, m2)
