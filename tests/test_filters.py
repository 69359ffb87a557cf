"""Golden tests: spatial filters vs OpenCV / scipy / torch behaviors."""

import cv2
import numpy as np
import jax.numpy as jnp
from scipy.ndimage import uniform_filter as scipy_uniform

from retinex_tpu.ops import filters as flt


def _nhwc(img2d):
    return jnp.asarray(img2d, jnp.float32)[None, :, :, None]


def test_gaussian_blur_matches_cv2(rng):
    img = rng.random((40, 56)).astype(np.float32)
    got = np.asarray(flt.gaussian_blur(_nhwc(img), 15, 0.0))[0, :, :, 0]
    want = cv2.GaussianBlur(img, (15, 15), 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_laplacian_matches_cv2(rng):
    img = (rng.random((32, 32)) * 255).astype(np.uint8)
    got = np.asarray(flt.laplacian(_nhwc(img.astype(np.float32))))[0, :, :, 0]
    want = cv2.Laplacian(img.astype(np.float64), cv2.CV_64F)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_sobel_edge_map_matches_reference_formula(rng):
    import torch
    import torch.nn.functional as F

    img = rng.random((1, 3, 24, 24)).astype(np.float32)
    t = torch.from_numpy(img)
    gray = torch.mean(t, dim=1, keepdim=True)
    padded = F.pad(gray, (1, 1, 1, 1), mode="reflect")
    sx = torch.tensor([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=torch.float32).view(1, 1, 3, 3)
    sy = torch.tensor([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=torch.float32).view(1, 1, 3, 3)
    gx = F.conv2d(padded, sx)
    gy = F.conv2d(padded, sy)
    want = torch.sqrt(gx**2 + gy**2).numpy()[0, 0]

    x = jnp.asarray(img.transpose(0, 2, 3, 1))
    got = np.asarray(flt.sobel_edge_map(x))[0, :, :, 0]
    # torch conv2d is cross-correlation; Sobel kernels are antisymmetric so the
    # magnitude is identical either way.
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_uniform_filter_matches_scipy(rng):
    img = rng.random((30, 30)).astype(np.float64)
    got = np.asarray(flt.uniform_filter(_nhwc(img.astype(np.float32)), 7))[0, :, :, 0]
    want = scipy_uniform(img, size=7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_forward_diff_matches_reference(rng):
    img = rng.random((2, 8, 9, 3)).astype(np.float32)
    gh, gv = flt.forward_diff(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(gh), img[:, :, :-1] - img[:, :, 1:], atol=1e-7)
    np.testing.assert_allclose(np.asarray(gv), img[:, :-1] - img[:, 1:], atol=1e-7)


def test_central_gradient_matches_torch(rng):
    import torch

    img = rng.random((1, 3, 10, 12)).astype(np.float32)
    t = torch.from_numpy(img)
    want_x = torch.gradient(t, dim=3)[0].numpy()
    want_y = torch.gradient(t, dim=2)[0].numpy()
    x = jnp.asarray(img.transpose(0, 2, 3, 1))
    got_x = np.asarray(flt.central_gradient(x, axis=2)).transpose(0, 3, 1, 2)
    got_y = np.asarray(flt.central_gradient(x, axis=1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_x, want_x, atol=1e-5)
    np.testing.assert_allclose(got_y, want_y, atol=1e-5)
