"""Decompose stream_map's cost on the heavy (checkpoint-statistics)
scene: 598 ms/map at the r4 calibration (num_slabs=18, w_max=56,
dup_cap=2M) vs 15 ms on the uniform scene.

Variants isolate the suspects: the (tiles, slabs, 64-window) descriptor
build (scales with num_slabs), the duplication machinery (dup slot
enumeration + 2x-longer sort), and the table build itself.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/profile_map.py [--scene heavy|uniform] [--gw 2]
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--scene", default="heavy")
  p.add_argument("--gw", type=int, default=2)
  p.add_argument("--iters", type=int, default=3)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  jax.config.update(
      "jax_compilation_cache_dir",
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), ".jaxcache"))

  from bench import IMAGE_SIZE, N, heavy_scene, uniform_scene, _cal_cached
  from tpu_splatting import RasterConfig
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.utils.benchmarked import benchmarked
  import dataclasses

  rng = np.random.default_rng(1 if args.scene == "heavy" else 0)
  scene_fn = heavy_scene if args.scene == "heavy" else uniform_scene
  packed, depth, feats = scene_fn(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)
  config = RasterConfig(compute_point_heuristic=True,
                        compute_visibility=True)

  cal = _cal_cached(
      f"{args.scene}_gw{args.gw}",
      lambda: calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                               group_width=args.gw))
  print(f"# cal: {cal}", file=sys.stderr)
  cfg = dataclasses.replace(config, big_tile_window=cal["big_tile_window"])
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=args.gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])

  def run(label, **over):
    kw = dict(caps)
    kw.update(over)
    f = lambda p, d, ft: stream_map(p, d, ft, IMAGE_SIZE, cfg, **kw)
    try:
      ms = benchmarked(label, f, (packed, depth, feats), iters=args.iters)
      print(f"{label}: {ms:.1f} ms")
    except Exception as e:
      print(f"{label}: FAILED {str(e)[:120]}")

  run("full map")
  run("no table (edges/desc only)", build_table=False)
  run("dup disabled (overflow ok)", wide_cap=64, dup_cap=0)
  run("dup, no table", wide_cap=64, dup_cap=0, build_table=False)
  run("slabs=4", num_slabs=4)
  run("slabs=4, no table", num_slabs=4, build_table=False)
  run("w_max=16", w_max=16)


if __name__ == "__main__":
  main()
