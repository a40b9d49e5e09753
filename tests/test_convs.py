"""Conv primitives vs torch (CPU) — exact-semantics parity for the ISG's
ConvTranspose (stride/padding/output_padding) and periodic convs."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from percnn_tpu.ops import convs as cv  # noqa: E402
from percnn_tpu.ops.interp import resize_align_corners  # noqa: E402


def test_pointwise_conv_matches_torch_1x1():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, 10, 11).astype(np.float32)  # NCHW for torch
    w = rng.randn(8, 2, 1, 1).astype(np.float32)  # OIHW
    b = rng.randn(8).astype(np.float32)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
    # ours: channels-last
    x_cl = np.transpose(x, (0, 2, 3, 1))
    got = cv.pointwise_conv(jnp.asarray(x_cl), jnp.asarray(w[:, :, 0, 0].T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)), rtol=2e-5, atol=2e-5)


def test_conv_periodic_matches_torch_circular():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 12, 12).astype(np.float32)
    w = rng.randn(16, 2, 5, 5).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    ref = F.conv2d(
        F.pad(torch.tensor(x), (2, 2, 2, 2), mode="circular"),
        torch.tensor(w),
        torch.tensor(b),
    ).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    w_cl = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
    got = cv.conv_nd_periodic(jnp.asarray(x_cl), jnp.asarray(w_cl), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n_in,stride,pad,opad", [(25, 2, 2, 1), (13, 2, 2, 1), (8, 3, 1, 2)])
def test_conv_transpose_matches_torch_2d(n_in, stride, pad, opad):
    rng = np.random.RandomState(2)
    cin, cout, k = 2, 8, 5
    x = rng.randn(1, cin, n_in, n_in).astype(np.float32)
    w = rng.randn(cin, cout, k, k).astype(np.float32)  # torch convT: [Cin, Cout, kh, kw]
    b = rng.randn(cout).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=stride, padding=pad, output_padding=opad,
    ).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    w_cl = np.transpose(w, (2, 3, 0, 1))  # -> [kh, kw, Cin, Cout]
    got = cv.conv_transpose_torch(
        jnp.asarray(x_cl), jnp.asarray(w_cl), jnp.asarray(b),
        stride=stride, padding=pad, output_padding=opad,
    )
    assert got.shape == np.transpose(ref, (0, 2, 3, 1)).shape
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)), rtol=2e-4, atol=2e-4)


def test_conv_transpose_matches_torch_3d():
    rng = np.random.RandomState(3)
    cin, cout, k, n = 2, 4, 5, 6
    x = rng.randn(1, cin, n, n, n).astype(np.float32)
    w = rng.randn(cin, cout, k, k, k).astype(np.float32)
    b = rng.randn(cout).astype(np.float32)
    ref = F.conv_transpose3d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=2, padding=2, output_padding=1,
    ).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    w_cl = np.transpose(w, (2, 3, 4, 0, 1))
    got = cv.conv_transpose_torch(
        jnp.asarray(x_cl), jnp.asarray(w_cl), jnp.asarray(b),
        stride=2, padding=2, output_padding=1,
    )
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 4, 1)), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode,method", [("bicubic", "cubic"), ("bilinear", "linear")])
def test_resize_align_corners_2d(mode, method):
    rng = np.random.RandomState(4)
    x = rng.randn(1, 2, 25, 25).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), size=(100, 100), mode=mode, align_corners=True).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    got = resize_align_corners(jnp.asarray(x_cl), (100, 100), method=method)
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


def test_resize_align_corners_trilinear():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 2, 8, 8, 8).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), size=(24, 24, 24), mode="trilinear", align_corners=True).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = resize_align_corners(jnp.asarray(x_cl), (24, 24, 24), method="linear")
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 4, 1)), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode,method", [("bicubic", "cubic"), ("bilinear", "linear")])
def test_resize_half_pixel_2d(mode, method):
    """align_corners=False (the F.interpolate default, used by the GS IC
    loss, train_2drd.py:334)."""
    rng = np.random.RandomState(6)
    x = rng.randn(1, 2, 25, 25).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), size=(100, 100), mode=mode,
                        align_corners=False).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 1))
    got = resize_align_corners(jnp.asarray(x_cl), (100, 100), method=method,
                               align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_resize_half_pixel_trilinear():
    rng = np.random.RandomState(7)
    x = rng.randn(1, 2, 24, 24, 24).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), size=(48, 48, 48), mode="trilinear",
                        align_corners=False).numpy()
    x_cl = np.transpose(x, (0, 2, 3, 4, 1))
    got = resize_align_corners(jnp.asarray(x_cl), (48, 48, 48), method="linear",
                               align_corners=False)
    np.testing.assert_allclose(np.asarray(got), np.transpose(ref, (0, 2, 3, 4, 1)),
                               rtol=1e-4, atol=1e-4)
