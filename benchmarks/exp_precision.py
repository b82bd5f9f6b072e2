"""Measure f32 matmul precision-pass cost at rasterizer kernel shapes.

Hypothesis: Precision.HIGHEST (6-pass bf16 decomposition) is 2-6x slower
than HIGH (3-pass) / DEFAULT (1-pass) on v5e, and the segment-sum's default-
precision f32 one-hot matmul is multi-pass — explaining both kernel costs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting.utils.benchmarked import benchmarked

P = jax.lax.Precision


def run_shape(m, k, n, reps, dtype=jnp.float32):
  rng = np.random.default_rng(0)
  a = jnp.asarray(rng.standard_normal((reps, m, k)), dtype)
  b = jnp.asarray(rng.standard_normal((reps, k, n)), dtype)

  for name, prec in [("DEFAULT", P.DEFAULT), ("HIGH", P.HIGH),
                     ("HIGHEST", P.HIGHEST)]:
    def f(a_, b_, prec=prec):
      out = jax.lax.dot_general(
          a_, b_, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
          preferred_element_type=jnp.float32, precision=prec)
      return out.sum()
    benchmarked(f"mm {m}x{k}x{n} {dtype.__name__} {name} x{reps}",
                f, (a, b), iters=20)

  ab = a.astype(jnp.bfloat16)
  bb = b.astype(jnp.bfloat16)
  def fb(a_, b_):
    out = jax.lax.dot_general(
        a_, b_, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out.sum()
  benchmarked(f"mm {m}x{k}x{n} bf16 x{reps}", fb, (ab, bb), iters=20)


def main():
  # rasterizer quadratic-form shape: (G,6)@(6,PIX), batched like the chunk
  # grid (35k chunks -> use 4096 reps as proxy)
  run_shape(128, 6, 256, 2048)
  # scan tril shape
  run_shape(128, 128, 256, 2048)
  # segment-sum one-hot shape
  run_shape(512, 1024, 16, 1024)


if __name__ == "__main__":
  main()
