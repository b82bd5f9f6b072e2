"""Headline benchmark — one JSON line for the driver.

North-star protocol (BASELINE.md): forward+backward render at 2048 px on one
TPU v5e chip vs the RTX-4090 diff_gaussian_rasterization baseline
(28.52 it/s = 35.1 ms/frame on the bicycle scene).  The mip-NeRF-360 scenes
are not available offline, so this uses a synthetic scene calibrated to the
bicycle workload scale (~2M visible splats at 2048x1536 with a similar
overlap/pixel profile); the comparison is approximate until real scene data
is wired in.

Prints: {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

from __future__ import annotations

import json
import math
import sys

import numpy as np


BASELINE_MS = 35.1  # diff_gaussian_rasterization, bicycle @ 2048, RTX 4090


def main():
  import jax
  import jax.numpy as jnp

  from tpu_splatting import RasterConfig
  from tpu_splatting.mapper.tile_mapper import map_to_tiles
  from tpu_splatting.rasterizer.function import rasterize_with_tiles
  from tpu_splatting.utils.benchmarked import benchmarked

  image_size = (2048, 1536)
  n = 2_000_000
  max_overlaps = 1 << 22

  rng = np.random.default_rng(0)
  w, h = image_size
  density = 1.2 * w / (1 + math.sqrt(n))
  packed = np.zeros((n, 7), np.float32)
  packed[:, 0] = rng.uniform(0, w, n)
  packed[:, 1] = rng.uniform(0, h, n)
  theta = rng.uniform(0, np.pi, n)
  packed[:, 2] = np.cos(theta)
  packed[:, 3] = np.sin(theta)
  packed[:, 4:6] = (rng.random((n, 2)) + 0.2) * density
  packed[:, 6] = rng.uniform(0.1, 0.9, n)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(rng.uniform(0.05, 0.95, n).astype(np.float32))
  feats = jnp.asarray(rng.random((n, 3)).astype(np.float32))

  config = RasterConfig(chunk_size=128)

  def fwd_bwd(p, f, d):
    mapping = map_to_tiles(jax.lax.stop_gradient(p),
                           jax.lax.stop_gradient(d), image_size, config,
                           max_overlaps=max_overlaps, use_depth16=True,
                           features=jax.lax.stop_gradient(f))

    def loss(p, f):
      o = rasterize_with_tiles(p, f, mapping, image_size, config)
      return jnp.sum(o.image ** 2) + jnp.sum(o.image_weight)

    return jax.grad(loss, argnums=(0, 1))(p, f)

  # the benchmark is only valid if NO overlaps were dropped: auto-grow the
  # capacity until overflow is zero, fail the metric if it never is
  for _ in range(4):
    m = jax.jit(lambda p, d, f: map_to_tiles(
        p, d, image_size, config, max_overlaps=max_overlaps,
        use_depth16=True, features=f))(packed, depth, feats)
    overflow = int(m.num_overflow)
    print(f"# overlaps capacity {max_overlaps}, overflow {overflow}",
          file=sys.stderr)
    if overflow == 0:
      break
    # grow just past the measured need (oversized capacity pads the chunk
    # grid with dummies and slows every downstream stage)
    need = int((max_overlaps + overflow) * 1.1)
    max_overlaps = ((need + 127) // 128) * 128
  assert overflow == 0, (
      f"benchmark invalid: {overflow} overlaps dropped at capacity "
      f"{max_overlaps}")

  ms = benchmarked("fwd+bwd 2048px 2M splats", fwd_bwd,
                   (packed, feats, depth), iters=3)

  print(json.dumps({
      "metric": "synthetic_bicycle_2048px_fwd_bwd",
      "value": round(ms, 3),
      "unit": "ms",
      "vs_baseline": round(BASELINE_MS / ms, 4),
  }))


if __name__ == "__main__":
  try:
    main()
  except Exception as e:  # report failure as a JSON line too
    print(json.dumps({
        "metric": "synthetic_bicycle_2048px_fwd_bwd",
        "value": -1,
        "unit": "ms",
        "vs_baseline": 0.0,
        "error": str(e)[:200],
    }))
    sys.exit(0)
