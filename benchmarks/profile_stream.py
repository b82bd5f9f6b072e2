"""Stage-by-stage profile of the STREAM fwd+bwd hot path on the real chip.

Times map / forward / backward / reduce / full-grad separately at the
headline scene, in both the plain and the trainer (visibility +
heuristics) configurations, so optimization targets the right component.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_stream.py \
    [--gw 2] [--heur] [--stages map,fwd,bwd,reduce,full]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--gw", type=int, default=2)
  p.add_argument("--heur", action="store_true",
                 help="trainer config (visibility + point heuristics)")
  p.add_argument("--iters", type=int, default=3)
  p.add_argument("--passes", type=int, default=2)
  p.add_argument("--stages", type=str, default="map,fwd,bwd,reduce,full")
  args = p.parse_args()
  stages = set(args.stages.split(","))

  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import IMAGE_SIZE, N, uniform_scene
  from tpu_splatting import RasterConfig
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.rasterizer.stream_function import (
      entile, probe_width, stream_rasterize_with_mapping, stream_reduce,
      tile_mask)
  from tpu_splatting.rasterizer.stream_kernels import (
      slab_width, stream_backward, stream_forward)
  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)

  config = RasterConfig(compute_point_heuristic=args.heur,
                        compute_visibility=args.heur,
                        stream_passes=args.passes)
  gw = args.gw
  cal = calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                         group_width=gw)
  print(f"# calibration: {cal}", file=sys.stderr)
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])
  map_f = lambda p_, d, f_: stream_map(p_, d, f_, IMAGE_SIZE, config,
                                       **caps)
  m = jax.jit(map_f)(packed, depth, feats)
  print(f"# overflow {int(m.num_overflow)} groups {m.num_groups} "
        f"slabs {m.num_slabs} slab_cap {m.slab_cap} w_max {m.w_max}",
        file=sys.stderr)

  f = m.feature_size
  slabw = slab_width(config, f)
  run_cap = m.run_cap
  print(f"# slabw {slabw} run_cap {run_cap}", file=sys.stderr)

  if "map" in stages:
    benchmarked("map", map_f, (packed, depth, feats), iters=args.iters)

  fwd_f = lambda mm: stream_forward(mm, config)
  image_tiled = jax.jit(fwd_f)(m)
  if "fwd" in stages:
    benchmarked("fwd", fwd_f, (m,), iters=args.iters)

  g_img = jnp.ones_like(image_tiled)
  bwd_f = lambda mm, it, gi: stream_backward(mm, it, gi, config, run_cap)
  gout = jax.jit(bwd_f)(m, image_tiled, g_img)
  if "bwd" in stages:
    benchmarked("bwd", bwd_f, (m, image_tiled, g_img), iters=args.iters)

  if "asm" in stages:
    # shared-assembly variants (config.stream_share_asm dataflow)
    fwd_a = lambda mm: stream_forward(mm, config, with_asm=True)
    _, asm = jax.jit(fwd_a)(m)
    benchmarked("fwd+asm_out", fwd_a, (m,), iters=args.iters)
    bwd_a = lambda mm, it, gi, a: stream_backward(mm, it, gi, config,
                                                  run_cap, asm=a)
    benchmarked("bwd_from_asm", bwd_a, (m, image_tiled, g_img, asm),
                iters=args.iters)

  red_f = lambda go, mm: stream_reduce(go, mm, run_cap, slabw)
  if "reduce" in stages:
    benchmarked("reduce", red_f, (gout, m), iters=args.iters)

  if "full" in stages:
    rngt = np.random.default_rng(7)
    tgt_full = jnp.asarray(
        rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))
    tgt = entile(tgt_full, m.tiles_wide, m.tiles_high, config.tile_size)
    mask = tile_mask(IMAGE_SIZE, m.tiles_wide, m.tiles_high,
                     config.tile_size)
    pw = probe_width(config)

    def fwd_bwd(p_, f_, tgt, mask, mapping):
      probe = jnp.zeros((p_.shape[0], pw), p_.dtype)

      def loss(p_, f_, probe):
        it = stream_rasterize_with_mapping(
            p_, f_, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
        err = it[:, :3, :] - tgt
        return (jnp.sum(mask * (err * err))
                + jnp.sum(mask[:, 0, :] * it[:, 3, :]))

      return jax.grad(loss, argnums=(0, 1, 2))(p_, f_, probe)

    benchmarked("full fwd+bwd", fwd_bwd, (packed, feats, tgt, mask, m),
                iters=args.iters)


if __name__ == "__main__":
  main()
