"""Optimizer tests: fractional Adam/LaProp semantics vs a sequential numpy
reference, sparse equivalence with dense Adam at weight 1, visibility
weighting, and ParameterClass row surgery."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splatting.optim import (FractionalAdam, FractionalLaProp,
                                 GroupConfig, ParameterClass, SparseAdam,
                                 VisibilityAwareLaProp)


def np_fractional_adam(params, grads, weights, cfg, steps):
  """Sequential numpy mirror of the reference scalar kernel
  (fractional_adam.py:8-45)."""
  n, d = params.shape
  m = np.zeros((n, d))
  v = np.zeros((n, d))
  tw = np.zeros(n)
  p = params.copy()
  b1, b2 = cfg.betas
  for s in range(steps):
    g, w = grads[s], weights[s]
    tw = tw + w
    for i in range(n):
      if w[i] <= 0:
        continue
      bias = np.sqrt(1 - b2 ** tw[i]) / (1 - b1 ** tw[i])
      for j in range(d):
        m[i, j] = m[i, j] * b1 ** w[i] + g[i, j] * (1 - b1 ** w[i])
        v[i, j] = v[i, j] * b2 ** w[i] + g[i, j] ** 2 * (1 - b2 ** w[i])
        step = m[i, j] / max(np.sqrt(v[i, j]), cfg.eps) * bias * cfg.lr
        p[i, j] -= step * (1 - np.exp(-2 * w[i]))
  return p


@pytest.mark.parametrize("seed", range(3))
def test_fractional_adam_matches_numpy(seed):
  rng = np.random.default_rng(seed)
  n, d, steps = 12, 3, 5
  cfg = GroupConfig(type="scalar", lr=0.01)
  params = {"x": jnp.asarray(rng.standard_normal((n, d)))}
  grads_seq = rng.standard_normal((steps, n, d))
  weights_seq = rng.random((steps, n)) * (rng.random((steps, n)) > 0.3)

  opt = FractionalAdam({"x": cfg})
  state = opt.init(params)
  p = params
  for s in range(steps):
    p, state = opt.step(p, {"x": jnp.asarray(grads_seq[s])}, state,
                        jnp.asarray(weights_seq[s]))

  expected = np_fractional_adam(
      np.asarray(params["x"]), grads_seq, weights_seq, cfg, steps)
  np.testing.assert_allclose(np.asarray(p["x"]), expected, atol=1e-10)


def test_sparse_adam_fully_visible_matches_adam_direction():
  """With weight=1 everywhere, the fractional update reduces to standard
  Adam (saturate(1) scaling aside)."""
  rng = np.random.default_rng(0)
  n, d = 8, 2
  params = {"x": jnp.asarray(rng.standard_normal((n, d)))}
  g = jnp.asarray(rng.standard_normal((n, d)))

  opt = SparseAdam({"x": GroupConfig(type="scalar", lr=0.1)})
  state = opt.init(params)
  p, state = opt.step(params, {"x": g}, state, jnp.ones(n, bool))

  # first Adam step with bias correction moves by ~lr*sign(g)*saturate(1)
  expected = np.asarray(params["x"]) - 0.1 * np.sign(g) * (1 - np.exp(-2))
  np.testing.assert_allclose(np.asarray(p["x"]), expected, atol=1e-5)


def test_invisible_points_untouched():
  rng = np.random.default_rng(1)
  n, d = 10, 3
  params = {"x": jnp.asarray(rng.standard_normal((n, d)))}
  g = jnp.asarray(rng.standard_normal((n, d)))
  weight = jnp.zeros(n).at[:5].set(1.0)

  opt = FractionalLaProp({"x": GroupConfig(type="scalar", lr=0.1)})
  state = opt.init(params)
  p, state2 = opt.step(params, {"x": g}, state, weight)

  np.testing.assert_array_equal(np.asarray(p["x"])[5:],
                                np.asarray(params["x"])[5:])
  assert np.all(np.asarray(p["x"])[:5] != np.asarray(params["x"])[:5])
  np.testing.assert_array_equal(np.asarray(state2.groups["x"]["m"])[5:], 0)


def test_local_vector_basis_rotation():
  """local_vector rotates gradients into the per-point basis and back
  (fractional.py:126-144): with an axis-swap basis the step is equivariant."""
  rng = np.random.default_rng(2)
  n = 6
  params = {"pos": jnp.asarray(rng.standard_normal((n, 2)))}
  g = jnp.asarray(rng.standard_normal((n, 2)))
  weight = jnp.ones(n)

  swap = jnp.tile(jnp.asarray([[0.0, 1.0], [1.0, 0.0]]), (n, 1, 1))
  ident = jnp.tile(jnp.eye(2), (n, 1, 1))

  opt = FractionalAdam({"pos": GroupConfig(type="local_vector", lr=0.05)})
  s0 = opt.init(params)
  p_ident, _ = opt.step(params, {"pos": g}, s0, weight, basis=ident)
  p_swap, _ = opt.step(
      {"pos": params["pos"][:, ::-1]}, {"pos": g[:, ::-1]}, s0, weight,
      basis=swap[:, ::-1, :][:, :, ::-1])

  step_ident = np.asarray(p_ident["pos"] - params["pos"])
  step_swap = np.asarray(p_swap["pos"] - params["pos"][:, ::-1])
  np.testing.assert_allclose(step_swap, step_ident[:, ::-1], atol=1e-8)


def test_visibility_aware_weighting():
  rng = np.random.default_rng(3)
  n, d = 8, 2
  params = {"x": jnp.asarray(rng.standard_normal((n, d)))}
  g = jnp.asarray(rng.standard_normal((n, d)))
  vis = jnp.asarray(rng.random(n).astype(np.float64))

  opt = VisibilityAwareLaProp({"x": GroupConfig(type="scalar", lr=0.1)},
                              vis_beta=0.5)
  state = opt.init(params)
  p, state2 = opt.step(params, {"x": g}, state, vis)
  assert bool(jnp.isfinite(p["x"]).all())
  assert bool((state2.running_vis > 0).all())
  # zero visibility leaves points untouched
  p2, _ = opt.step(params, {"x": g}, state, jnp.zeros(n))
  np.testing.assert_array_equal(np.asarray(p2["x"]), np.asarray(params["x"]))


def test_parameter_class_row_surgery():
  rng = np.random.default_rng(4)
  n = 20
  tensors = {
      "position": jnp.asarray(rng.standard_normal((n, 2))),
      "alpha": jnp.asarray(rng.standard_normal((n, 1))),
      "meta": jnp.asarray(rng.standard_normal((n, 4))),  # non-optimized
  }
  groups = {"position": GroupConfig(type="scalar", lr=0.01),
            "alpha": GroupConfig(type="scalar", lr=0.1)}
  pc = ParameterClass.create(tensors, groups)

  grads = {"position": jnp.ones((n, 2)), "alpha": jnp.ones((n, 1))}
  pc = pc.step(grads, jnp.asarray(rng.random(n)))
  assert pc.batch_size == (n,)

  # filter to 10 rows: optimizer state rows follow
  keep = jnp.arange(0, n, 2)
  sub = pc[keep]
  assert sub.batch_size == (10,)
  np.testing.assert_array_equal(
      np.asarray(sub.opt_state.groups["position"]["m"]),
      np.asarray(pc.opt_state.groups["position"]["m"])[::2])

  # append 5 rows with zero state
  extra = {k: jnp.zeros((5, *v.shape[1:]), v.dtype)
           for k, v in sub.tensors.items()}
  grown = sub.append_tensors(extra)
  assert grown.batch_size == (15,)
  np.testing.assert_array_equal(
      np.asarray(grown.opt_state.groups["alpha"]["m"])[10:], 0)

  # checkpoint roundtrip
  state = grown.state_dict()
  restored = ParameterClass.from_state_dict(state)
  np.testing.assert_array_equal(np.asarray(restored.tensors["position"]),
                                np.asarray(grown.tensors["position"]))
  np.testing.assert_array_equal(
      np.asarray(restored.opt_state.total_weight),
      np.asarray(grown.opt_state.total_weight))
