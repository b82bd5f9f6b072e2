"""4096 px envelope benchmark (VERDICT r2 #7).

Renders the uniform headline scene scaled to 4096x3072 (49,152 tiles at
tile 16 — the 16-bit-home / 12-bit-depth key layout, stream.py
depth_bits_for) through the production stream pipeline, trainer config,
fwd+bwd.  The reference benches 4096 px (BENCHMARK.md); its RTX-4090
number is 15.37 it/s = 65.1 ms/frame on bicycle @ 4096.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_4k.py
"""

from __future__ import annotations

import sys

import numpy as np

BASELINE_4K_MS = 65.1   # diff_gaussian_rasterization bicycle @ 4096
IMAGE_SIZE = (4096, 3072)
N = 2_000_000


def main():
  import dataclasses
  import os

  import jax
  import jax.numpy as jnp
  jax.config.update(
      "jax_compilation_cache_dir",
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), ".jaxcache"))

  from bench import _cal_cached, _trainer_config, uniform_scene
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.rasterizer.stream_function import (
      entile, probe_width, stream_rasterize_with_mapping, tile_mask)
  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)

  gw = int(os.environ.get("TPU_SPLAT_GW", "8"))
  config = _trainer_config(gw)
  cal = _cal_cached(
      f"4k_gw{gw}",
      lambda: calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                               group_width=gw))
  print(f"# calibration: {cal}", file=sys.stderr)
  config = dataclasses.replace(config,
                               big_tile_window=cal["big_tile_window"])
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])
  map_f = lambda p, d, f: stream_map(p, d, f, IMAGE_SIZE, config, **caps)
  m = jax.jit(map_f)(packed, depth, feats)
  print(f"# overflow {int(m.num_overflow)} tiles {m.num_tiles} "
        f"depth_bits {m.depth_bits}", file=sys.stderr)
  assert int(m.num_overflow) == 0
  assert m.depth_bits == 12    # the >16k-tile key layout

  rngt = np.random.default_rng(7)
  tgt_full = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))
  tgt = entile(tgt_full, m.tiles_wide, m.tiles_high, config.tile_size)
  mask = tile_mask(IMAGE_SIZE, m.tiles_wide, m.tiles_high,
                   config.tile_size)
  pw = probe_width(config)

  def fwd_bwd(p, f, tgt, mask, mapping):
    probe = jnp.zeros((p.shape[0], pw), p.dtype)

    def loss(p, f, probe):
      it = stream_rasterize_with_mapping(
          p, f, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
      err = it[:, :3, :] - tgt
      return (jnp.sum(mask * (err * err))
              + jnp.sum(mask[:, 0, :] * it[:, 3, :]))

    return jax.grad(loss, argnums=(0, 1, 2))(p, f, probe)

  ms_map = benchmarked("4k map", map_f, (packed, depth, feats), iters=3)
  ms_r = benchmarked("4k fwd+bwd", fwd_bwd, (packed, feats, tgt, mask, m),
                     iters=3)
  total = ms_map + ms_r + 2 * 1.2
  print(f"4k frame: {total:.1f} ms  (baseline {BASELINE_4K_MS} ms, "
        f"vs_baseline {BASELINE_4K_MS / total:.3f})")


if __name__ == "__main__":
  main()
