"""Core math tests: quaternions, eigendecomposition, pdf forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splatting.data_types import mat_to_quat
from tpu_splatting.lib import gaussian2d as g2d
from tpu_splatting.lib import transforms


@pytest.mark.parametrize("seed", range(5))
def test_quat_roundtrip(seed):
  rng = np.random.default_rng(seed)
  q = rng.standard_normal((10, 4))
  q /= np.linalg.norm(q, axis=1, keepdims=True)
  r = transforms.quat_to_mat(jnp.asarray(q))

  # rotation matrices are orthonormal with det 1
  rtr = np.einsum("nij,nik->njk", np.asarray(r), np.asarray(r))
  np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (10, 3, 3)),
                             atol=1e-12)
  np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-12)

  # mat -> quat -> mat roundtrip
  for i in range(10):
    q2 = mat_to_quat(r[i])
    r2 = transforms.quat_to_mat(q2)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r[i]), atol=1e-8)


@pytest.mark.parametrize("seed", range(10))
def test_eig2x2(seed):
  rng = np.random.default_rng(seed)
  m = rng.standard_normal((20, 2, 2))
  cov_m = m @ m.transpose(0, 2, 1) + np.eye(2) * 0.01
  cov = jnp.asarray(
      np.stack([cov_m[:, 0, 0], cov_m[:, 0, 1], cov_m[:, 1, 1]], -1))

  sigma, v1, v2 = g2d.eig2x2(cov)
  sigma, v1, v2 = np.asarray(sigma), np.asarray(v1), np.asarray(v2)

  # reconstruct: cov = s1^2 v1 v1^T + s2^2 v2 v2^T
  rec = (sigma[:, 0:1, None] ** 2 * v1[:, :, None] * v1[:, None, :]
         + sigma[:, 1:2, None] ** 2 * v2[:, :, None] * v2[:, None, :])
  np.testing.assert_allclose(rec, cov_m, atol=1e-10)
  assert np.all(sigma[:, 0] >= sigma[:, 1])

  # packed reconstruction helper agrees
  rec2 = g2d.cov_from_g2d(jnp.asarray(v1), jnp.asarray(sigma))
  np.testing.assert_allclose(np.asarray(rec2), np.asarray(cov), atol=1e-10)


def test_eig2x2_isotropic_safe():
  """Isotropic covariance must not produce NaN (safe-normalise fallback)."""
  cov = jnp.asarray([[2.0, 0.0, 2.0]])
  sigma, v1, v2 = g2d.eig2x2(cov)
  assert np.all(np.isfinite(np.asarray(sigma)))
  np.testing.assert_allclose(np.asarray(v1), [[1.0, 0.0]])
  np.testing.assert_allclose(np.asarray(sigma), [[np.sqrt(2), np.sqrt(2)]])


@pytest.mark.parametrize("seed", range(5))
def test_pdf_conic_vs_axis_form(seed):
  """The axis/sigma pdf equals the conic pdf of the reconstructed covariance
  (mirrors reference tests/test_conic.py)."""
  rng = np.random.default_rng(seed)
  mean = jnp.asarray(rng.standard_normal((50, 2)) * 4)
  axis = jnp.asarray(
      rng.standard_normal((50, 2)) / np.linalg.norm(
          rng.standard_normal((50, 2)), axis=1, keepdims=True))
  axis = transforms.normalize(jnp.asarray(rng.standard_normal((50, 2))))
  sigma = jnp.asarray(rng.random((50, 2)) * 3 + 0.3)
  xy = jnp.asarray(rng.standard_normal((50, 2)) * 4)

  p1 = g2d.gaussian_pdf(xy, mean, axis, sigma)
  conic = g2d.inverse_cov(g2d.cov_from_g2d(axis, sigma))
  p2 = g2d.conic_pdf(xy, mean, conic)
  np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-12)


def test_antialias_pdf_integrates_pdf():
  """AA pdf approximates the integral of the pdf over a 1px box: for large
  sigma it converges to the point pdf."""
  mean = jnp.zeros((1, 2))
  axis = jnp.asarray([[1.0, 0.0]])
  sigma = jnp.asarray([[40.0, 30.0]])
  xy = jnp.asarray([[3.0, 2.0]])

  p = g2d.gaussian_pdf(xy, mean, axis, sigma)
  p_aa = g2d.gaussian_pdf_antialias(xy, mean, axis, sigma)
  np.testing.assert_allclose(np.asarray(p_aa), np.asarray(p), rtol=0.01)
