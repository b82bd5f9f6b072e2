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

  def body(carry, _):
    eps = carry * 1e-30
    perturbed = []
    injected = False
    for a in args:
      if not injected and hasattr(a, "dtype") and jnp.issubdtype(
          a.dtype, jnp.floating):
        perturbed.append(a + eps.astype(a.dtype))
        injected = True
      else:
        perturbed.append(a)
    out = f(*perturbed)
    leaf = jax.tree.leaves(out)[0]
    return leaf.reshape(-1)[0].astype(jnp.float32), None

  from functools import partial

  @partial(jax.jit, static_argnums=0)
  def run(n_iters):
    carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
    return carry

  # compile + warmup with the SAME static length as the timed call
  # (a different length would recompile inside the timed region)
  del warmup
  np.asarray(run(iters))

  if profile:
    with jax.profiler.trace("/tmp/tpu_splatting_trace"):
      np.asarray(run(iters))

  t0 = time.time()
  np.asarray(run(iters))
  ms = (time.time() - t0) / iters * 1000.0
  print(f"{name}: {ms:.3f} ms/iter  ({1000.0 / ms:.1f} it/s)",
        file=sys.stderr)
  return ms
