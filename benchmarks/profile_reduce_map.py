"""Internal stage timings for stream_reduce and stream_map.

reduce: shift-add only / +compaction sort / +pid sort (full)
map: dup_cap=0 vs 8192, num_slabs=1 vs 2, build_table on/off

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_reduce_map.py
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main():
  import jax
  import jax.numpy as jnp
  jax.config.update(
      "jax_compilation_cache_dir",
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), ".jaxcache"))

  from bench import IMAGE_SIZE, N, _cal_cached, _trainer_config, uniform_scene
  from tpu_splatting import RasterConfig
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.rasterizer.stream_kernels import (
      slab_width, stream_backward, stream_forward)
  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)

  gw = int(os.environ.get("TPU_SPLAT_GW", "8"))
  config = _trainer_config(gw)
  cal = _cal_cached(
      f"uniform_gw{gw}",
      lambda: calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                               group_width=gw))
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])
  m = jax.jit(lambda p, d, f: stream_map(p, d, f, IMAGE_SIZE, config,
                                         **caps))(packed, depth, feats)
  f = m.feature_size
  slabw = slab_width(config, f)
  run_cap = m.run_cap
  it = 3

  img = jax.jit(lambda mm: stream_forward(mm, config))(m)
  gi = jnp.ones_like(img)
  gout = jax.jit(lambda mm, i_, g_: stream_backward(
      mm, i_, g_, config, run_cap))(m, img, gi)

  # ---- reduce internals --------------------------------------------------
  n = m.num_points
  tw, th = m.tiles_wide, m.tiles_high
  t_total = m.num_tiles
  r_rows = t_total * run_cap

  from tpu_splatting.rasterizer.stream_kernels import merge_grad_slabs

  def red_a(gout, mapping):
    return [c.sum() for c in merge_grad_slabs(gout, mapping, run_cap,
                                              slabw)]

  def red_b(gout, mapping):
    acc_cols = merge_grad_slabs(gout, mapping, run_cap, slabw)
    row = jnp.arange(r_rows, dtype=jnp.int32)
    run_lens = jnp.minimum(
        mapping.run_starts[1:] - mapping.run_starts[:-1], run_cap)
    pad_row = (row % run_cap) >= jnp.repeat(run_lens, run_cap)
    ops = (pad_row.astype(jnp.int32),) + tuple(acc_cols)
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return [c.sum() for c in s[1:]]

  def red_c(gout, mapping):
    from tpu_splatting.rasterizer.stream_function import stream_reduce
    return stream_reduce(gout, mapping, run_cap, slabw)

  benchmarked("reduce merge-kernel", red_a, (gout, m), iters=it)
  benchmarked("reduce +compact-sort", red_b, (gout, m), iters=it)
  benchmarked("reduce full", red_c, (gout, m), iters=it)

  # ---- map variants ------------------------------------------------------
  def map_with(**over):
    kw = dict(caps)
    kw.update(over)
    return lambda p, d, f_: stream_map(p, d, f_, IMAGE_SIZE, config, **kw)

  benchmarked("map full", map_with(), (packed, depth, feats), iters=it)
  benchmarked("map dup0", map_with(dup_cap=0), (packed, depth, feats),
              iters=it)
  benchmarked("map slabs1", map_with(num_slabs=1), (packed, depth, feats),
              iters=it)
  benchmarked("map notable", map_with(build_table=False),
              (packed, depth, feats), iters=it)


if __name__ == "__main__":
  main()
