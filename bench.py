"""Headline benchmark — one JSON line for the driver.

North-star protocol (BASELINE.md): forward+backward render at 2048 px on one
TPU v5e chip vs the RTX-4090 diff_gaussian_rasterization baseline
(28.52 it/s = 35.1 ms/frame on the bicycle scene).  The mip-NeRF-360 scenes
are not available offline, so this uses a synthetic scene calibrated to the
bicycle workload scale (~2M visible splats at 2048x1536 with a similar
overlap/pixel profile); the comparison is approximate until real scene data
is wired in.

Uses the tile-stream pipeline (tpu_splatting/rasterizer/stream*.py): one
N-sized home sort, windowed fetch, rank-mask-matmul compositing, sort-free
gradient reduction.  The mapping is rebuilt EVERY iteration (the reference
protocol renders a new viewpoint per frame) and the run is only published if
no overlaps were dropped (num_overflow == 0).

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
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.rasterizer.stream_function import (
      stream_rasterize_with_mapping)
  from tpu_splatting.utils.benchmarked import benchmarked

  image_size = (2048, 1536)
  n = 2_000_000

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

  config = RasterConfig()
  gw = 2

  cal = calibrate_stream(packed, depth, feats, image_size, config,
                         group_width=gw)
  print(f"# calibration: {cal}", file=sys.stderr)
  run_cap = cal["run_cap"]

  map_f = lambda p, d, f: stream_map(
      p, d, f, image_size, config, num_slabs=cal["num_slabs"],
      strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
      group_width=gw, w_max=cal["w_max"], run_cap=cal["run_cap"])

  # the benchmark is only valid if NO overlaps were dropped
  m = jax.jit(map_f)(packed, depth, feats)
  overflow = int(m.num_overflow)
  print(f"# overflow {overflow}", file=sys.stderr)
  assert overflow == 0, f"benchmark invalid: {overflow} rows dropped"
  assert cal["max_run"] <= run_cap

  def fwd_bwd(p, f, mapping):
    def loss(p, f):
      img, wgt = stream_rasterize_with_mapping(
          p, f, mapping, image_size, config)
      return jnp.sum(img ** 2) + jnp.sum(wgt)

    return jax.grad(loss, argnums=(0, 1))(p, f)

  # A frame = one mapping dispatch + one fwd+bwd dispatch — the natural
  # two-call structure of a training step (the trainer reuses the mapping
  # between the forward and backward anyway).  Timed as two on-device
  # scans; the per-dispatch tunnel overhead (~1.2 ms each) is added so the
  # reported number is a full wall-clock frame.
  ms_map = benchmarked("map 2048px 2M splats", map_f,
                       (packed, depth, feats), iters=3)
  ms_raster = benchmarked("fwd+bwd 2048px 2M splats", fwd_bwd,
                          (packed, feats, m), iters=3)
  ms = ms_map + ms_raster + 2 * 1.2

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
