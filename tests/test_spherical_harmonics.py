"""SH evaluation tests: basis orthogonality sanity, gradcheck, and
comparison against a direct per-point implementation (mirrors reference
tests/test_spherical_harmonics.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradcheck import check_grads

from tpu_splatting import evaluate_sh_at
from tpu_splatting.lib.sh import rsh_cart


def make_inputs(seed, n=32, degree=3, k=3, dtype=jnp.float64):
  rng = np.random.default_rng(seed)
  params = jnp.asarray(
      rng.standard_normal((n, k, (degree + 1) ** 2)) * 0.3, dtype=dtype)
  positions = jnp.asarray(rng.standard_normal((n, 3)) * 5, dtype=dtype)
  camera_pos = jnp.asarray(rng.standard_normal(3), dtype=dtype)
  return params, positions, camera_pos


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_orthonormality(degree):
  """Monte-Carlo check that the basis is orthonormal over the sphere."""
  rng = np.random.default_rng(0)
  dirs = rng.standard_normal((200000, 3))
  dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
  basis = np.asarray(rsh_cart(jnp.asarray(dirs), degree))
  gram = 4 * np.pi * (basis.T @ basis) / dirs.shape[0]
  np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=0.05)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("degree", [1, 3, 4])
def test_sh_matches_direct(seed, degree):
  params, positions, camera_pos = make_inputs(seed, degree=degree)
  out = evaluate_sh_at(params, positions, camera_pos)

  # direct per-point computation
  d = np.array(positions - camera_pos)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  basis = np.asarray(rsh_cart(jnp.asarray(d), degree))
  expected = np.clip(
      np.einsum("nkb,nb->nk", np.asarray(params), basis) + 0.5, 0, 1)
  np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)


@pytest.mark.parametrize("seed", range(5))
def test_sh_gradcheck(seed):
  params, positions, camera_pos = make_inputs(seed, n=16)

  # keep outputs away from the clamp boundaries so gradcheck is smooth
  params = params * 0.1

  def f(params, positions, camera_pos):
    return evaluate_sh_at(params, positions, camera_pos)

  check_grads(f, (params, positions, camera_pos), order=1,
                            modes=["rev"], rtol=1e-6, atol=1e-6)


def test_sh_indexed_variant():
  params, positions, camera_pos = make_inputs(0)
  indexes = jnp.asarray([3, 1, 7])
  out = evaluate_sh_at(params, positions, camera_pos, indexes=indexes)
  full = evaluate_sh_at(params, positions, camera_pos)
  np.testing.assert_allclose(np.asarray(out), np.asarray(full)[[3, 1, 7]])
