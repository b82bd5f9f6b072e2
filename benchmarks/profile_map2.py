"""Honest stream_map decomposition (r5): forces CHOSEN output subsets.

benchmarked() now reduces every returned leaf, so DCE is controlled by
what each variant returns: `desc` keeps the edge/window/descriptor path,
`table` keeps the sort+pack path, `grad` keeps the inverse-pid path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/profile_map2.py [--scene heavy|uniform] [--gw 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--scene", default="uniform")
  p.add_argument("--gw", type=int, default=8)
  p.add_argument("--iters", type=int, default=3)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import IMAGE_SIZE, N, heavy_scene, uniform_scene, _cal_cached
  from bench import _trainer_config
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map

  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(1 if args.scene == "heavy" else 0)
  scene_fn = heavy_scene if args.scene == "heavy" else uniform_scene
  packed, depth, feats = (jnp.asarray(x)
                          for x in scene_fn(rng, N, IMAGE_SIZE))
  config = _trainer_config(args.gw)
  cal = _cal_cached(
      f"{args.scene}_gw{args.gw}",
      lambda: calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                               group_width=args.gw))
  cfg = dataclasses.replace(config, big_tile_window=cal["big_tile_window"])
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=args.gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])

  def run(label, pick, **over):
    kw = dict(caps)
    kw.update(over)

    def f(p, d, ft):
      m = stream_map(p, d, ft, IMAGE_SIZE, cfg, **kw)
      return pick(m)

    try:
      ms = benchmarked(label, f, (packed, depth, feats), iters=args.iters)
      print(f"{label}: {ms:.1f} ms", flush=True)
    except Exception as e:
      print(f"{label}: FAILED {str(e)[:160]}", flush=True)

  run("everything", lambda m: m)
  run("desc+overflow only", lambda m: (m.desc, m.overflow, m.strip_blk))
  run("table only", lambda m: m.table)
  run("grad_src/dup only", lambda m: (m.grad_src, m.dup_src, m.dup_pid))
  run("run_starts only", lambda m: m.run_starts)
  run("overflow only", lambda m: m.overflow)
  run("everything, no table", lambda m: m, build_table=False)


if __name__ == "__main__":
  main()
