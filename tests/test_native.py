"""Native C++ data-pipeline kernel tests (numpy-fallback parity).

The suite passes whether or not native/libpriorflow_io.so is built; when it
is, every kernel must agree with the numpy reference semantics.
"""

import numpy as np
import pytest

from prior_flow_tpu.data import frame_utils, native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        native.build(quiet=True)
    return native.available()


class TestNativeFlo:
    def test_roundtrip(self, rng, tmp_path):
        flow = (rng.normal(size=(13, 29, 2)) * 40).astype(np.float32)
        p = str(tmp_path / "t.flo")
        frame_utils.write_flo(p, flow)
        out = native.read_flo(p)
        np.testing.assert_array_equal(out, flow)

    def test_fused_wrap(self, rng, tmp_path):
        flow = (rng.normal(size=(8, 32, 2)) * 60).astype(np.float32)
        p = str(tmp_path / "w.flo")
        frame_utils.write_flo(p, flow)
        out = native.read_flo(p, wrap_u=True)
        W = 32
        exp = flow.copy()
        exp[..., 0] = (exp[..., 0] + W / 2) % W - W / 2
        np.testing.assert_allclose(out, exp, atol=1e-4)
        assert out[..., 0].min() >= -W / 2 and out[..., 0].max() < W / 2

    def test_bad_file_raises(self, tmp_path, built):
        p = str(tmp_path / "bad.flo")
        with open(p, "wb") as f:
            f.write(b"\x00" * 16)
        with pytest.raises(ValueError):
            native.read_flo(p)


class TestNativeRoll:
    def test_matches_numpy_u8(self, rng):
        img = rng.integers(0, 255, (16, 32, 3)).astype(np.uint8)
        for k in (0, 5, -7, 32, 45, -33):
            np.testing.assert_array_equal(native.roll(img, k),
                                          np.roll(img, k, axis=1))

    def test_matches_numpy_f32(self, rng):
        arr = rng.normal(size=(8, 16, 2)).astype(np.float32)
        np.testing.assert_array_equal(native.roll(arr, 3),
                                      np.roll(arr, 3, axis=1))


class TestNativeEraser:
    def test_mean_color(self, rng):
        img = rng.integers(0, 255, (16, 32, 3)).astype(np.uint8)
        np.testing.assert_allclose(native.mean_color(img),
                                   img.reshape(-1, 3).mean(0), atol=0.01)

    def test_erase_rect(self, rng):
        img = rng.integers(0, 255, (16, 32, 3)).astype(np.uint8)
        color = native.mean_color(img)
        out = img.copy()
        native.erase_rect(out, 5, 3, 10, 6, color)
        exp = img.copy()
        exp[3:9, 5:15] = color.astype(np.uint8)
        np.testing.assert_array_equal(out, exp)

    def test_erase_rect_clipped_at_border(self, rng):
        img = rng.integers(0, 255, (16, 32, 3)).astype(np.uint8)
        color = np.array([1.0, 2.0, 3.0], np.float32)
        out = img.copy()
        native.erase_rect(out, 28, 12, 10, 10, color)  # overflows both dims
        exp = img.copy()
        exp[12:, 28:] = color.astype(np.uint8)
        np.testing.assert_array_equal(out, exp)
