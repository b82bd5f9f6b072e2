"""Bisect map_to_tiles cost on the real chip: which stage dominates?"""

from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting import RasterConfig
from tpu_splatting.mapper import tile_mapper as tm
from tpu_splatting.lib import gaussian2d as g2d
from tpu_splatting.utils.benchmarked import benchmarked
from benchmarks.bench_components import synthetic_2d


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--max-overlaps", type=int, default=1 << 23)
  p.add_argument("--iters", type=int, default=5)
  args = p.parse_args()

  n = args.n
  image_size = (1024, 768)
  packed, depth_a, feats = synthetic_2d(n, image_size, scale_factor=4.0)
  config = RasterConfig()
  ts = config.tile_size
  tw, th = tm.tile_shape(image_size, ts)
  num_tiles = tw * th
  p_cap = args.max_overlaps
  padded_size = tm.pad_to_tile(image_size, ts)
  w_small = config.tile_window
  it = args.iters

  def stage_hits(gaussians, depth):
    mean, axis, sigma, alpha = g2d.unpack_g2d(gaussians)
    gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
    valid = (alpha > config.alpha_threshold) & (depth > 0) & (gscale > 0)
    u1, u2, e1, e2 = tm._obb_axes(axis, sigma, gscale, ts)
    min_tile, max_tile = tm._tile_bounds(mean, axis, sigma, gscale,
                                         padded_size, ts)
    span = max_tile - min_tile
    is_big = valid & jnp.any(span > w_small, -1)
    small_valid = valid & ~is_big
    hit, tid = tm._candidate_hits(mean, u1, u2, e1, e2, min_tile, span,
                                  small_valid, w_small, ts, tw)
    return hit, tid, is_big

  benchmarked("hits", lambda g, d: stage_hits(g, d)[0].sum(),
              (packed, depth_a), iters=it)

  hit, tid, is_big = jax.jit(stage_hits)(packed, depth_a)
  print("hits:", int(hit.sum()), "big:", int(is_big.sum()))

  def stage_nonzero(is_big):
    return jnp.nonzero(is_big, size=config.big_capacity, fill_value=n)[0]
  benchmarked("nonzero_big", stage_nonzero, (is_big,), iters=it)

  pid_col = jnp.arange(n, dtype=jnp.int32)[:, None]

  def make_key(hit, tid, d):
    key = (tid.astype(jnp.uint32) << 16) | (
        jnp.clip(d[:, None], 0.0, 1.0) * 65535.0).astype(jnp.uint32)
    key = jnp.where(hit, key, jnp.uint32(0xFFFFFFFF))
    pid = jnp.where(hit, pid_col, n)
    return key.reshape(-1), jnp.broadcast_to(pid, tid.shape).reshape(-1)

  benchmarked("keys", lambda h, t, d: make_key(h, t, d)[0],
              (hit, tid, depth_a), iters=it)

  key, pid = jax.jit(make_key)(hit, tid, depth_a)

  benchmarked("sort_2op", lambda k, p_: jax.lax.sort((k, p_), num_keys=1),
              (key, pid), iters=it)

  # payload-riding sort: 2 + 10 operands
  cols = tuple(
      jnp.broadcast_to(packed[:, c:c + 1], tid.shape).reshape(-1)
      for c in range(7)) + tuple(
      jnp.broadcast_to(feats[:, c:c + 1], tid.shape).reshape(-1)
      for c in range(3))
  benchmarked("sort_12op", lambda k, p_, *cs: jax.lax.sort(
      (k, p_) + cs, num_keys=1), (key, pid) + cols, iters=it)

  sorted_key, sorted_pid = jax.lax.sort((key, pid), num_keys=1)
  sorted_tile = (sorted_key[:p_cap] >> 16).astype(jnp.int32)

  def stage_ranges(st):
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(st, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(st, tids, side="right").astype(jnp.int32)
    return starts, ends
  benchmarked("ranges_searchsorted", stage_ranges, (sorted_tile,), iters=it)

  starts, ends = jax.jit(stage_ranges)(sorted_tile)

  def stage_chunks(starts, ends):
    g = config.chunk_size
    counts_t = ends - starts
    aligned_chunks = jnp.maximum((counts_t + g - 1) // g, 1)
    chunk_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(aligned_chunks, dtype=jnp.int32)])
    k_chunks = p_cap // g + num_tiles
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    chunk_ids = jnp.arange(k_chunks, dtype=jnp.int32)
    ct = tm._marker_fill(tids, chunk_offsets[:num_tiles], k_chunks)
    fc = tm._marker_fill(chunk_offsets[:num_tiles],
                         chunk_offsets[:num_tiles], k_chunks)
    sf = tm._marker_fill(starts, chunk_offsets[:num_tiles], k_chunks)
    ef = tm._marker_fill(ends, chunk_offsets[:num_tiles], k_chunks)
    return ct, fc, sf, ef
  benchmarked("chunk_fills", stage_chunks, (starts, ends), iters=it)


if __name__ == "__main__":
  main()
