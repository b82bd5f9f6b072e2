"""Data-movement kernel tests (window_copy, segment_sum_sorted) against
numpy references — these carry the whole pipeline's correctness, so they get
randomized shapes including empty windows and sentinel padding."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splatting.rasterizer.layout import segment_sum_sorted, window_copy


@pytest.mark.parametrize("seed", range(4))
def test_window_copy(seed):
  rng = np.random.default_rng(seed)
  g = 8
  p = 256
  k = 17
  rows = rng.standard_normal((p + g, 5)).astype(np.float32)
  src = rng.integers(0, p, k).astype(np.int32)
  cnt = rng.integers(0, g + 1, k).astype(np.int32)
  cnt[3] = 0
  cnt[5] = g

  out = np.asarray(window_copy(jnp.asarray(rows), jnp.asarray(src),
                               jnp.asarray(cnt), g))
  expect = np.zeros((k * g, 5), np.float32)
  for i in range(k):
    for r in range(cnt[i]):
      expect[i * g + r] = rows[src[i] + r]
  np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n", [64, 300])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_segment_sum_sorted(seed, n, dtype):
  rng = np.random.default_rng(seed + 10)
  m = 1000
  c = 6
  # sorted ids with gaps, duplicates, and sentinel (= n) padding rows
  ids = np.sort(rng.integers(0, n, m)).astype(np.int32)
  ids[-50:] = n + rng.integers(0, 5, 50)  # sentinel tail (sorted)
  ids = np.sort(ids)
  rows = rng.standard_normal((m, c)).astype(dtype)

  out = np.asarray(segment_sum_sorted(
      jnp.asarray(rows), jnp.asarray(ids), n, block=64, sub=128))

  expect = np.zeros((n, c), dtype)
  for i in range(m):
    if ids[i] < n:
      expect[ids[i]] += rows[i]
  np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


def test_segment_sum_sorted_empty_and_heavy():
  """One id owning most rows; many empty ids."""
  m, c, n = 512, 3, 100
  ids = np.full(m, 7, np.int32)
  ids[-10:] = 99
  rows = np.ones((m, c), np.float32)
  out = np.asarray(segment_sum_sorted(
      jnp.asarray(rows), jnp.asarray(ids), n, block=32, sub=64))
  expect = np.zeros((n, c), np.float32)
  expect[7] = m - 10
  expect[99] = 10
  np.testing.assert_allclose(out, expect, rtol=1e-6)
