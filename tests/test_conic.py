"""Conic / axis-sigma pdf tests (mirrors reference tests/test_conic.py:85-98):
the two pdf parameterisations must agree, and both must gradcheck in f64."""

import jax.numpy as jnp
import numpy as np
import pytest

from gradcheck import check_grads

from tpu_splatting.lib import gaussian2d as g2d


def make_inputs(seed, n=32, dtype=jnp.float64):
  rng = np.random.default_rng(seed)
  mean = jnp.asarray(rng.uniform(-5, 5, (n, 2)), dtype)
  theta = rng.uniform(0, np.pi, n)
  axis = jnp.asarray(np.stack([np.cos(theta), np.sin(theta)], -1), dtype)
  sigma = jnp.asarray(rng.uniform(0.5, 3.0, (n, 2)), dtype)
  xy = jnp.asarray(mean + rng.normal(0, 2.0, (n, 2)), dtype)
  return xy, mean, axis, sigma


@pytest.mark.parametrize("seed", range(5))
def test_conic_pdf_matches_axis_form(seed):
  xy, mean, axis, sigma = make_inputs(seed)
  cov = g2d.cov_from_g2d(axis, sigma)
  conic = g2d.inverse_cov(cov)

  p_conic = g2d.conic_pdf(xy, mean, conic)
  p_axis = g2d.gaussian_pdf(xy, mean, axis, sigma)
  np.testing.assert_allclose(np.asarray(p_conic), np.asarray(p_axis),
                             rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seed", range(5))
def test_conic_pdf_gradcheck(seed):
  xy, mean, axis, sigma = make_inputs(seed, n=8)
  cov = g2d.cov_from_g2d(axis, sigma)
  conic = g2d.inverse_cov(cov)
  check_grads(lambda *a: g2d.conic_pdf(*a), (xy, mean, conic),
              order=1, modes=["rev"], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_axis_pdf_gradcheck(seed):
  xy, mean, axis, sigma = make_inputs(seed, n=8)
  check_grads(lambda *a: g2d.gaussian_pdf(*a), (xy, mean, axis, sigma),
              order=1, modes=["rev"], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(3))
def test_antialias_pdf_gradcheck(seed):
  xy, mean, axis, sigma = make_inputs(seed, n=8)
  check_grads(lambda *a: g2d.gaussian_pdf_antialias(*a),
              (xy, mean, axis, sigma), order=1, modes=["rev"],
              rtol=1e-6, atol=1e-6)
