"""Benchmark harness (TPU equivalent of the reference benchmarks/util.py).

The reference times with torch.cuda.Event (benchmarks/util.py:6-44).  Under
JAX on the remote-tunnelled TPU, per-call dispatch latency (~1 ms) and an
async queue that reports readiness early make call-level timing meaningless,
so ``benchmarked`` runs the workload inside a single jitted ``lax.scan`` —
one dispatch, ``iters`` on-device iterations — and syncs with a host fetch.
A tiny carry-dependent perturbation of the first float input prevents XLA
from hoisting the loop body.
"""

from __future__ import annotations

import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def benchmarked(name: str, f: Callable, args, iters: int = 50,
                warmup: int = 2, profile: bool = False) -> float:
  """Time ``f(*args)`` on device; returns milliseconds per iteration."""

  from functools import partial

  # args are passed as jit ARGUMENTS, not closure captures: captured arrays
  # become inline HLO constants, which the remote-compile tunnel rejects
  # (HTTP 413) or uploads very slowly for large inputs
  @partial(jax.jit, static_argnums=0)
  def run(n_iters, *run_args):
    def body(carry, _):
      # carry-dependent zero added to EVERY leaf of EVERY argument
      # (value-preserving): without this, XLA hoists any computation that
      # does not depend on a perturbed input out of the scan and the bench
      # measures one run amortised over iters.  Bool leaves xor with False.
      eps = carry * 1e-30

      def perturb(a):
        if not hasattr(a, "dtype"):
          return a
        if jnp.issubdtype(a.dtype, jnp.floating):
          return a + eps.astype(a.dtype)
        if a.dtype == jnp.bool_:
          return jnp.logical_xor(a, eps != 0)
        return a + (eps != 0).astype(a.dtype)

      out = f(*jax.tree.map(perturb, run_args))
      # force EVERY output leaf with a full reduce: forcing only one
      # element lets XLA dead-code-eliminate every computation that does
      # not feed it (a StreamMapping's first leaf is the table — profile
      # runs were silently dropping the whole descriptor/edges path).
      # The reduces cost ~1 ms/GB of output, negligible vs what they keep.
      acc = jnp.float32(0.0)
      for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
          acc = acc + jnp.sum(leaf, dtype=jnp.float32)
      return acc, None

    carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
    return carry

  # compile + warmup with the SAME static length as the timed call
  # (a different length would recompile inside the timed region)
  del warmup
  np.asarray(run(iters, *args))

  if profile:
    with jax.profiler.trace("/tmp/tpu_splatting_trace"):
      np.asarray(run(iters, *args))

  t0 = time.time()
  np.asarray(run(iters, *args))
  ms = (time.time() - t0) / iters * 1000.0
  print(f"{name}: {ms:.3f} ms/iter  ({1000.0 / ms:.1f} it/s)",
        file=sys.stderr)
  return ms
