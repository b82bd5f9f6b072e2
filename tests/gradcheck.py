"""Minimal self-contained gradient checker (f64 central differences).

Replaces torch.autograd.gradcheck in the reference test strategy
(SURVEY.md §4.1): compares u^T J v from jax.vjp against central finite
differences of u^T f(x + t v) along random directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _random_like(rng: np.random.Generator, tree):
  return jax.tree.map(
      lambda x: jnp.asarray(rng.standard_normal(np.shape(x)), dtype=x.dtype),
      tree)


def _dot(a, b):
  leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
  return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def check_grads(f, args, order: int = 1, modes=("rev",), rtol: float = 1e-6,
                atol: float = 1e-6, eps: float = 1e-6, n_directions: int = 3,
                seed: int = 0):
  """Check reverse-mode gradients of ``f`` at ``args`` (f64 recommended).

  For each random direction pair (v over inputs, u over outputs) verifies
  u^T J v computed by jax.vjp against central finite differences.
  """
  del order, modes  # API compatibility; only first-order reverse mode
  rng = np.random.default_rng(seed)

  f_jit = jax.jit(f)   # without this every probe re-traces f (~seconds)
  out, vjp = jax.vjp(f, *args)

  @jax.jit
  def probe(t, v, u):
    shifted = jax.tree.map(lambda x, dv: x + t * dv, list(args), list(v))
    return _dot(f_jit(*shifted), u)

  for _ in range(n_directions):
    v = _random_like(rng, args)
    u = _random_like(rng, out)

    # analytic: <vjp(u), v>
    grads = vjp(u)
    analytic = float(_dot(grads, v))

    # numeric: d/dt <u, f(args + t v)> via central differences
    numeric = float(probe(eps, v, u) - probe(-eps, v, u)) / (2 * eps)

    np.testing.assert_allclose(
        analytic, numeric, rtol=rtol, atol=atol,
        err_msg=f"gradient mismatch: analytic={analytic} numeric={numeric}")
