"""Differentiable feature gather + segmented sort utilities.

Equivalents of the reference's misc/indexing.py:9-58 (a Taichi gather with
a hand-wired autograd backward) and the exposed-but-unused CUB segmented
sort (cuda_lib/segmented_sort_pairs.cu:1-74).  Under JAX both are one-liners
— ``take`` is natively differentiable (its VJP is the scatter-add the
reference hand-writes) and a segmented sort is a two-key lexicographic sort.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def index_features(features: jnp.ndarray, indexes: jnp.ndarray
                   ) -> jnp.ndarray:
  """Differentiable gather of feature rows (reference misc/indexing.py:9-58).

  The VJP scatter-adds cotangents back to the source rows — exactly the
  reference's hand-written backward kernel.
  """
  return jnp.take(features, indexes, axis=0)


def segmented_sort_pairs(keys: jnp.ndarray, values: jnp.ndarray,
                         segments: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Sort (key, value) pairs within segments (cuda_lib parity utility).

  Args:
    keys, values: (N,) arrays.
    segments: (N,) segment id per element.

  Returns keys and values sorted by (segment, key); segment grouping is
  preserved and ordering within each segment is by key.
  """
  _, sorted_keys, sorted_values = jax.lax.sort(
      (segments, keys, values), num_keys=2)
  return sorted_keys, sorted_values
