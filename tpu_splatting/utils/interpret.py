"""Pallas interpret-mode selection.

The kernels run compiled on TPU and interpreted on CPU (tests, f64
gradchecks, and the TPU-vs-CPU oracle in benchmarks/check_tpu.py).  The
check must see through BOTH ways of landing on CPU: a cpu default
backend (tests/conftest.py) and a ``jax.default_device(cpu)`` scope on a
TPU-backed process (calibration, oracle runs under the axon platform).
"""

from __future__ import annotations

import jax


def use_interpret() -> bool:
  if jax.default_backend() == "cpu":
    return True
  dd = jax.config.jax_default_device
  return dd is not None and getattr(dd, "platform", None) == "cpu"
