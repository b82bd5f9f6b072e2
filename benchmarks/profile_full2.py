"""Bisect the full-renderer gap (r5): is the 2x slowdown the CAPACITIES?

The full-path calibration (projected scene) settled at num_slabs=4 /
w_max=27 vs the 2D scene's num_slabs=2 / w_max=15.  A split slab doubles
both the mask-matmul count and the window count (PLAN: fwd 75 -> 186 ms
measured).  This times the SAME 2D raster protocol under both capacity
sets, and the projected-splat raster under both, isolating capacity
effects from graph-composition effects.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_full2.py
"""

from __future__ import annotations

import sys

import numpy as np


def main():
  import dataclasses

  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import (IMAGE_SIZE, N, _cal_cached, _trainer_config,
                     lift_to_3d, uniform_scene)
  from tpu_splatting.perspective.projection import (ndc_depth,
                                                    project_to_image)
  from tpu_splatting.rasterizer.stream import stream_map
  from tpu_splatting.rasterizer.stream_function import (
      entile, probe_width, stream_rasterize_with_mapping, tile_mask)
  from tpu_splatting.utils.benchmarked import benchmarked

  gw = 8
  config = _trainer_config(gw)
  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)

  # the two capacity sets (from .bench_cal.json r4; static)
  caps_2d = dict(num_slabs=2, strip_cap=2048, slab_cap=512, w_max=15,
                 run_cap=256, wide_cap=0, dup_cap=0, group_width=gw)
  caps_full = dict(num_slabs=4, strip_cap=2048, slab_cap=512, w_max=27,
                   run_cap=256, wide_cap=0, dup_cap=0, group_width=gw)

  # projected splats (what the full path rasterizes)
  g3d, cam = lift_to_3d(np.asarray(packed), np.asarray(depth),
                        np.asarray(feats), IMAGE_SIZE, near=0.1,
                        far=100.0, fov_deg=70.0)
  g2d, pdepths, _ = jax.jit(
      lambda g: project_to_image(g, cam, config))(g3d)
  nd = jnp.where(pdepths[:, 0] > 0,
                 ndc_depth(pdepths[:, 0], cam.near_plane, cam.far_plane),
                 0.0)

  rngt = np.random.default_rng(7)
  tgt_full = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))

  pw = probe_width(config)

  def raster_ms(tag, p, d, f, caps):
    m = jax.jit(lambda p, d, f: stream_map(
        p, d, f, IMAGE_SIZE, config, **caps))(p, d, f)
    print(f"# {tag} overflow {int(m.num_overflow)} "
          f"{[int(x) for x in m.overflow]}", file=sys.stderr)
    tgt = entile(tgt_full, m.tiles_wide, m.tiles_high, config.tile_size)
    mask = tile_mask(IMAGE_SIZE, m.tiles_wide, m.tiles_high,
                     config.tile_size)

    def fwd_bwd(p, f, tgt, mask, mapping):
      probe = jnp.zeros((p.shape[0], pw), p.dtype)

      def loss(p, f, probe):
        it = stream_rasterize_with_mapping(
            p, f, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
        err = it[:, :3, :] - tgt
        return (jnp.sum(mask * (err * err))
                + jnp.sum(mask[:, 0, :] * it[:, 3, :]))

      return jax.grad(loss, argnums=(0, 1, 2))(p, f, probe)

    benchmarked(tag, fwd_bwd, (p, f, tgt, mask, m), iters=3)

  raster_ms("2d-scene @ caps_2d", packed, depth, feats, caps_2d)
  raster_ms("2d-scene @ caps_full", packed, depth, feats, caps_full)
  raster_ms("projected @ caps_full", g2d, nd, feats, caps_full)
  # projected scene at the tight caps may overflow — still timed, the
  # overflow count printed above says whether it is comparable
  raster_ms("projected @ caps_2d", g2d, nd, feats, caps_2d)


if __name__ == "__main__":
  main()
