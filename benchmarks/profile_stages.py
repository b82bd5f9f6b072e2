"""Stage-by-stage profile of the fwd+bwd hot path on the real chip.

Times each pipeline stage in isolation so optimization targets the right
component (PLAN.md). Not a driver bench; a diagnostic tool.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting import RasterConfig
from tpu_splatting.mapper.tile_mapper import map_to_tiles, tile_shape
from tpu_splatting.rasterizer import kernels
from tpu_splatting.rasterizer.function import (_kernel_inputs, _pid_chunked,
                                               rasterize_with_tiles,
                                               reduce_chunked_to_points)
from tpu_splatting.utils.benchmarked import benchmarked
from benchmarks.bench_components import synthetic_2d


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--width", type=int, default=1024)
  p.add_argument("--height", type=int, default=768)
  p.add_argument("--chunk", type=int, default=128)
  p.add_argument("--scale", type=float, default=4.0)
  p.add_argument("--max-overlaps", type=int, default=1 << 23)
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--depth16", action="store_true")
  args = p.parse_args()

  n = args.n
  image_size = (args.width, args.height)
  packed, depth, feats = synthetic_2d(n, image_size, scale_factor=args.scale)
  config = RasterConfig(chunk_size=args.chunk)
  tw, th = tile_shape(image_size, config.tile_size)
  num_tiles = tw * th

  map_f = lambda p_, d, f_: map_to_tiles(
      p_, d, image_size, config, max_overlaps=args.max_overlaps,
      use_depth16=args.depth16, features=f_)
  mapping = jax.jit(map_f)(packed, depth, feats)
  n_real = int(np.asarray(mapping.chunk_cnt).sum())
  print(f"n={n} tiles={num_tiles} chunks={mapping.num_chunks} "
        f"overlaps={n_real} overflow={int(mapping.num_overflow)}")

  it = args.iters

  # 1. tile mapper, full (payload riding)
  benchmarked("map_to_tiles", map_f, (packed, depth, feats), iters=it)

  rows, src, cnt = jax.jit(
      lambda m: _kernel_inputs(m, packed, feats))(mapping)

  # 3. forward kernel (in-kernel window fetch)
  benchmarked("fwd_kernel", lambda r, s_, c_, ct: kernels.forward(
      r, s_, c_, ct, config, num_tiles, tw),
      (rows, src, cnt, mapping.chunk_to_tile), iters=it)

  image_tiled, vis = jax.jit(lambda r: kernels.forward(
      r, src, cnt, mapping.chunk_to_tile, config, num_tiles, tw))(rows)

  # 4. backward kernel alone
  g_img = jnp.ones_like(image_tiled)
  benchmarked("bwd_kernel", lambda r, im, gi, s_, c_, ct: kernels.backward(
      r, im, gi, s_, c_, ct, config, num_tiles, tw),
      (rows, image_tiled, g_img, src, cnt, mapping.chunk_to_tile), iters=it)

  gout = jax.jit(lambda r, im, gi: kernels.backward(
      r, im, gi, src, cnt, mapping.chunk_to_tile, config, num_tiles, tw))(
          rows, image_tiled, g_img)

  # 5. reduction alone (pid sort + sorted segment sum)
  pid = jax.jit(lambda m: _pid_chunked(m))(mapping)
  c_out = gout.shape[1]
  benchmarked("reduce_sort_only", lambda g_, p_: jax.lax.sort(
      (p_,) + tuple(g_[:, i] for i in range(c_out)), num_keys=1)[0],
      (gout, pid), iters=it)
  sorted_ops = jax.jit(lambda g_, p_: jax.lax.sort(
      (p_,) + tuple(g_[:, i] for i in range(c_out)), num_keys=1))(gout, pid)
  ids_sorted = sorted_ops[0]
  rows_sorted = jnp.stack(sorted_ops[1:], -1)
  from tpu_splatting.rasterizer.layout import segment_sum_sorted
  benchmarked("reduce_kernel_only", lambda r_, i_: segment_sum_sorted(
      r_, i_, n), (rows_sorted, ids_sorted), iters=it)
  benchmarked("sort_reduce", lambda g_, p_: reduce_chunked_to_points(
      g_, p_, n), (gout, pid), iters=it)

  # 6. full forward / fwd+bwd composites
  benchmarked("full_forward", lambda p_, f_, m: rasterize_with_tiles(
      p_, f_, m, image_size, config), (packed, feats, mapping), iters=it)

  def loss(p_, f_, m):
    o = rasterize_with_tiles(p_, f_, m, image_size, config)
    return jnp.sum(o.image ** 2) + jnp.sum(o.image_weight)
  benchmarked("full_fwd_bwd", jax.grad(loss, argnums=(0, 1)),
              (packed, feats, mapping), iters=it)

  def e2e(p_, d, f_):
    m = map_f(jax.lax.stop_gradient(p_), d, jax.lax.stop_gradient(f_))

    def inner(p__, f__):
      o = rasterize_with_tiles(p__, f__, m, image_size, config)
      return jnp.sum(o.image ** 2) + jnp.sum(o.image_weight)
    return jax.grad(inner, argnums=(0, 1))(p_, f_)
  benchmarked("e2e_map_fwd_bwd", e2e, (packed, depth, feats), iters=it)


if __name__ == "__main__":
  main()
