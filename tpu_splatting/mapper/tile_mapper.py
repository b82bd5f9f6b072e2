"""Tile mapping: assign depth-sorted gaussians to image tiles (pure jnp).

TPU-native re-design of the reference tile mapper
(/root/reference/taichi_splatting/mapper/tile_mapper.py:27-225 and
taichi_lib/grid_query.py:9-93).  The reference pipeline is:

  per-gaussian OBB tile count -> CUB exclusive scan (total to CPU!) ->
  dynamic allocation -> key-expansion kernel -> CUB radix sort (48/32-bit
  keys) -> range extraction.

That shape cannot exist under XLA (host sync + dynamic allocation), so this
implementation is re-architected around **static capacities + masks** and
one measured v5e fact: XLA's sort moves extra payload operands almost for
free (~0.4 ms per f32 column per 4M rows), while random row gathers cost
~7 ns/row (~600x off HBM bandwidth).  Consequently:

* Each gaussian tests a fixed ``tile_window``^2 candidate window of tiles
  against its oriented ellipse (the separating-axis OBB test of
  grid_query.py:30-43, reduced to closed interval form: for an affine map,
  the projection of a tile onto an ellipse axis is ``center +- extent`` with
  a *per-gaussian constant* extent, so no corner expansion is needed).
  Gaussians spanning more tiles are routed to a secondary "big" path with a
  wider window and a fixed capacity — overflow is counted and reported,
  never silently mis-rendered as long as ``num_overflow == 0``.

* Candidates are sorted by ``(tile_id, depth)`` with ``lax.sort`` — and the
  full point rows (and features, when provided) **ride the sort as payload
  operands**, so the rasterizer's per-overlap inputs come out of the sort
  already in tile-major depth order.  No per-overlap gather ever happens.

* The per-tile segments are consumed chunk-aligned: every tile owns
  ``ceil(count/chunk_size)`` chunks (at least one).  Only chunk-LEVEL
  metadata is materialised here (owning tile, source row offset, valid
  count); the (small Pallas) window-copy kernel in ``rasterizer/chunks.py``
  lays rows out per chunk at DMA speed.

Everything is forward-only / non-differentiable, matching the reference
(tile mapping runs under ``torch.no_grad``, tile_mapper.py:181); gradients
for the payload buffers are defined by the rasterizer's custom_vjp.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data_types import RasterConfig
from ..lib import gaussian2d as g2d


def pad_to_tile(image_size: Tuple[int, int], tile_size: int):
  """Round an image size up to a tile multiple (tile_mapper.py:20-24)."""
  return tuple(int(math.ceil(x / tile_size) * tile_size) for x in image_size)


def tile_shape(image_size: Tuple[int, int], tile_size: int) -> Tuple[int, int]:
  """(tiles_wide, tiles_high) for an image size."""
  w, h = pad_to_tile(image_size, tile_size)
  return w // tile_size, h // tile_size


def default_max_overlaps(n: int, image_size: Tuple[int, int],
                         config: RasterConfig) -> int:
  """Heuristic static overlap capacity: ~8 overlaps per gaussian, at least
  a few chunks per tile, rounded to the chunk size."""
  tw, th = tile_shape(image_size, config.tile_size)
  cap = max(8 * n, 4 * tw * th * config.chunk_size, 1 << 16)
  g = config.chunk_size
  return ((cap + g - 1) // g) * g


@dataclass(frozen=True)
class TileMapping:
  """Static-shape tile mapping result (pytree; sizes are static metadata).

  API-parity fields (reference tile_mapper.py:216-219):
    overlap_to_point: (P + 2*chunk,) i32 — point index per overlap, sorted by
      (tile, depth); padding entries are ``num_points`` (one past the end).
      The trailing ``2 * chunk_size`` rows are slack so chunk windows
      (fetched as two chunk-aligned blocks) never read out of bounds.
    tile_ranges: (T, 2) i32 — [start, end) into the sorted overlap list.

  Payload riding the sort (the TPU-native replacement for the rasterizer's
  per-overlap gather; None when the mapper was called without data):
    sorted_payload: (P + 2*chunk, 7 + F) f32 — packed gaussian row and feature
      row per overlap, in the same order as ``overlap_to_point``.

  Chunk-level layout for the Pallas rasterizer (K = P/chunk + T chunks):
    chunk_to_tile: (K,) i32 — owning tile of each chunk; dummy chunks = T.
    chunk_src: (K,) i32 — start row of the chunk's window into the sorted
      overlap domain.
    chunk_cnt: (K,) i32 — number of valid rows in the window (0 for dummy).
    num_overflow: () i32 — overlaps dropped due to capacity (0 == exact).
  """
  overlap_to_point: jnp.ndarray
  tile_ranges: jnp.ndarray
  sorted_payload: Optional[jnp.ndarray]
  chunk_to_tile: jnp.ndarray
  chunk_src: jnp.ndarray
  chunk_cnt: jnp.ndarray
  num_overflow: jnp.ndarray

  # static metadata
  num_points: int
  num_tiles: int
  tiles_wide: int
  tiles_high: int
  chunk_size: int
  small_window: int
  big_window: int
  feature_size: Optional[int]

  @property
  def num_chunks(self) -> int:
    return self.chunk_to_tile.shape[0]

  @property
  def point_id_chunked(self) -> jnp.ndarray:
    """(K * chunk_size,) i32 point id per chunk-aligned slot (null = n).

    Computed on demand (tests / fallback paths); the production path keeps
    everything in the compact sorted domain."""
    g = self.chunk_size
    k = self.num_chunks
    r = jnp.arange(g, dtype=jnp.int32)[None, :]
    src = self.chunk_src[:, None] + r                       # (K, g)
    valid = r < self.chunk_cnt[:, None]
    pid = self.overlap_to_point[src.reshape(-1)].reshape(k, g)
    return jnp.where(valid, pid, self.num_points).reshape(-1)


jax.tree_util.register_dataclass(
    TileMapping,
    data_fields=["overlap_to_point", "tile_ranges", "sorted_payload",
                 "chunk_to_tile", "chunk_src", "chunk_cnt", "num_overflow"],
    meta_fields=["num_points", "num_tiles", "tiles_wide", "tiles_high",
                 "chunk_size", "small_window", "big_window", "feature_size"])


def _obb_axes(axis, sigma, gscale, tile_size):
  """Rows of the image->ellipse transform plus per-axis tile half-extents.

  inv_basis rows are ``axis_i / (sigma_i * gscale)`` (grid_query.py:83);
  the projection of a tile onto row u covers ``u . center +- e`` with
  ``e = (|u_x| + |u_y|) * tile_size / 2``.
  """
  scale = jnp.maximum(sigma * gscale[:, None], 1e-12)
  u1 = axis / scale[:, 0:1]
  u2 = g2d.perp(axis) / scale[:, 1:2]
  e1 = (jnp.abs(u1[:, 0]) + jnp.abs(u1[:, 1])) * (tile_size * 0.5)
  e2 = (jnp.abs(u2[:, 0]) + jnp.abs(u2[:, 1])) * (tile_size * 0.5)
  return u1, u2, e1, e2


def _tile_bounds(mean, axis, sigma, gscale, image_size, tile_size):
  """Conservative tile range of each gaussian (grid_query.py:9-27)."""
  v2 = g2d.perp(axis)
  lower, upper = g2d.ellipse_bounds(
      mean, axis * (sigma[:, 0] * gscale)[:, None],
      v2 * (sigma[:, 1] * gscale)[:, None])

  max_tile = (jnp.asarray(image_size, jnp.int32) - 1) // tile_size
  min_tile = jnp.maximum(jnp.floor(lower / tile_size).astype(jnp.int32), 0)
  max_tile_b = jnp.ceil(upper / tile_size).astype(jnp.int32)
  max_tile_b = jnp.minimum(jnp.maximum(max_tile_b, min_tile + 1), max_tile + 1)
  return min_tile, max_tile_b


def _candidate_hits(mean, u1, u2, e1, e2, min_tile, span, valid,
                    window: int, tile_size: int, tiles_wide: int):
  """Test a window^2 candidate grid per gaussian.

  Returns (hit (N, window^2) bool, tile_id (N, window^2) i32).
  Candidate (a, b) covers tile (min_tile + (b, a)); out-of-span candidates
  miss.
  """
  offs = jnp.arange(window, dtype=jnp.int32)
  off_x = jnp.tile(offs, window)            # fastest-varying x
  off_y = jnp.repeat(offs, window)

  tile_x = min_tile[:, 0:1] + off_x[None, :]          # (N, W^2)
  tile_y = min_tile[:, 1:2] + off_y[None, :]
  in_span = (off_x[None, :] < span[:, 0:1]) & (off_y[None, :] < span[:, 1:2])

  # tile centre relative to the gaussian mean
  cx = (tile_x.astype(mean.dtype) + 0.5) * tile_size - mean[:, 0:1]
  cy = (tile_y.astype(mean.dtype) + 0.5) * tile_size - mean[:, 1:2]

  t1 = u1[:, 0:1] * cx + u1[:, 1:2] * cy
  t2 = u2[:, 0:1] * cx + u2[:, 1:2] * cy

  hit = ((jnp.abs(t1) <= 1.0 + e1[:, None]) & (jnp.abs(t2) <= 1.0 + e2[:, None])
         & in_span & valid[:, None])
  tile_id = tile_x + tile_y * tiles_wide
  return hit, tile_id


def _marker_fill(values: jnp.ndarray, positions: jnp.ndarray,
                 size: int) -> jnp.ndarray:
  """Piecewise-constant fill: out[s] = values[t] for the largest t with
  positions[t] <= s (positions nondecreasing, values nondecreasing).

  Replaces per-slot searchsorted/gather (catastrophically slow on TPU) with
  a tiny scatter + a dense cummax scan.  Only used on the small chunk-level
  (K-sized) domain."""
  buf = jnp.zeros((size,), values.dtype).at[positions].max(values,
                                                           mode="drop")
  return jax.lax.cummax(buf)


def calibrate_mapper(gaussians: jnp.ndarray, depth: jnp.ndarray,
                     image_size: Tuple[int, int],
                     config: RasterConfig) -> dict:
  """One cheap N-sized dry pass over a representative scene, returning
  measured statistics and suggested static capacities.

  The TPU mapper replaces the reference's host-synchronised dynamic
  allocation (tile_mapper.py:148-168) with static capacities; this helper
  is the sizing rule: run it once on a typical frame, then construct
  ``RasterConfig(tile_window=..., big_capacity=...)`` and pass
  ``max_overlaps`` to ``map_to_tiles``/``rasterize``.  ``num_overflow``
  still guards every real run.

  Returns a dict with:
    tile_window: smallest window covering >= 99.9% of valid points.
    big_capacity: 1.5x the count of points wider than that window.
    max_overlaps: 1.15x the exact OBB hit count at that window (chunk
      aligned), including an upper bound for big-path candidates.
  """
  ts = config.tile_size
  tw, _ = tile_shape(image_size, ts)
  padded_size = pad_to_tile(image_size, ts)

  # span histogram, then exact hits at the chosen window
  @jax.jit
  def span_hist(g, d):
    mean, axis, sigma, alpha = g2d.unpack_g2d(g)
    gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
    valid = (alpha > config.alpha_threshold) & (d.reshape(-1) > 0) & (
        gscale > 0)
    min_tile, max_tile = _tile_bounds(mean, axis, sigma, gscale,
                                      padded_size, ts)
    span = jnp.where(valid[:, None], (max_tile - min_tile).max(-1), 0)
    return valid.sum(dtype=jnp.int32), span

  n_valid, span = jax.device_get(span_hist(gaussians, depth))
  span = np.asarray(span)
  n_valid = max(int(n_valid), 1)
  window = int(np.quantile(span[span > 0], 0.999)) if (span > 0).any() else 1
  window = max(min(window, 8), 1)
  n_wide = int((span > window).sum())

  @partial(jax.jit, static_argnames=("window",))
  def hits_at(g, d, window: int):
    mean, axis, sigma, alpha = g2d.unpack_g2d(g)
    gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
    valid = (alpha > config.alpha_threshold) & (d.reshape(-1) > 0) & (
        gscale > 0)
    u1, u2, e1, e2 = _obb_axes(axis, sigma, gscale, ts)
    min_tile, max_tile = _tile_bounds(mean, axis, sigma, gscale,
                                      padded_size, ts)
    span_xy = max_tile - min_tile
    wide = valid & jnp.any(span_xy > window, -1)
    hit, _ = _candidate_hits(mean, u1, u2, e1, e2, min_tile, span_xy,
                             valid & ~wide, window, ts, tw)
    big_ub = jnp.where(
        wide, jnp.prod(jnp.minimum(span_xy, config.big_tile_window), -1), 0)
    return hit.sum(dtype=jnp.int32) + big_ub.sum(dtype=jnp.int32)

  total = int(hits_at(gaussians, depth, window))
  g = config.chunk_size
  cap = int(total * 1.15) + 4 * g
  return {
      "tile_window": window,
      "big_capacity": max(1024, int(n_wide * 1.5 + 0.5)),
      "max_overlaps": ((cap + g - 1) // g) * g,
      "measured_hits_upper_bound": total,
      "num_wide": n_wide,
      "num_valid": n_valid,
  }


@partial(jax.jit,
         static_argnames=("image_size", "config", "max_overlaps",
                          "use_depth16"))
def map_to_tiles(gaussians: jnp.ndarray, depth: jnp.ndarray,
                 image_size: Tuple[int, int], config: RasterConfig,
                 max_overlaps: int | None = None,
                 use_depth16: bool = False,
                 features: Optional[jnp.ndarray] = None) -> TileMapping:
  """Map packed 2D gaussians to depth-sorted per-tile overlap lists.

  Args mirror the reference map_to_tiles (tile_mapper.py:203-225):
    gaussians: (N, 7) packed gaussians.
    depth: (N,) or (N, 1) depths for sorting (NDC, non-negative); entries
      <= 0 mark culled points (projection's sentinel).
    image_size: (width, height) static.
    config: RasterConfig (static).
    max_overlaps: static overlap capacity (default: heuristic).
    use_depth16: quantise depth keys to 16 bits (tile_mapper.py:49-66),
      enabling a single packed 32-bit (tile << 16 | depth16) sort key.
    features: optional (N, F) per-point features.  When given, point rows
      AND feature rows ride the sort as payload so the rasterizer needs no
      per-overlap gather (the fast path used by ``rasterize``).

  The mapping itself is non-differentiable (inputs are stop_gradient'd by
  callers); gradients through ``sorted_payload`` are defined by the
  rasterizer custom_vjp, which reduces per-overlap cotangents back to
  points.
  """
  n = gaussians.shape[0]
  depth = depth.reshape(n)
  ts = config.tile_size
  tw, th = tile_shape(image_size, ts)
  num_tiles = tw * th
  assert num_tiles < 65535, (
      f"tile count {num_tiles} exceeds 16-bit id budget; increase tile_size")
  g = config.chunk_size
  padded_size = pad_to_tile(image_size, ts)

  if max_overlaps is None:
    max_overlaps = default_max_overlaps(n, image_size, config)
  p_cap = ((max_overlaps + g - 1) // g) * g   # chunk-aligned capacity

  # ---- depth-presort the points (cheap: N rows, one key) -------------------
  # All downstream candidate expansion happens in depth order, so the
  # candidate sort needs only a STABLE single tile key — a 2-key
  # lexicographic lax.sort is several times slower at tens of millions of
  # rows (measured), and exact f32 depth order among small gaussians comes
  # out better than the reference's quantised keys.  Non-negative f32 depth
  # bits compare correctly as int32.
  if features is not None:
    assert features.shape[0] == n, features.shape
    f_size = features.shape[1]
    row_payload = jnp.concatenate(
        [gaussians, features.astype(gaussians.dtype)], -1)   # (N, 7+F)
  else:
    f_size = None
    row_payload = gaussians

  dkey = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
  pre_ops = (dkey, jnp.arange(n, dtype=jnp.int32), depth) + tuple(
      row_payload[:, c] for c in range(row_payload.shape[1]))
  pre_sorted = jax.lax.sort(pre_ops, num_keys=1)
  orig_pid = pre_sorted[1]
  depth = pre_sorted[2]
  row_payload = jnp.stack(pre_sorted[3:], -1)
  gaussians = row_payload[:, :7]
  payload = row_payload if features is not None else None

  mean, axis, sigma, alpha = g2d.unpack_g2d(gaussians)
  gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
  valid = (alpha > config.alpha_threshold) & (depth > 0) & (gscale > 0)

  u1, u2, e1, e2 = _obb_axes(axis, sigma, gscale, ts)
  min_tile, max_tile = _tile_bounds(mean, axis, sigma, gscale, padded_size, ts)
  span = max_tile - min_tile

  w_small = config.tile_window
  is_big = valid & jnp.any(span > w_small, -1)
  small_valid = valid & ~is_big

  hit_s, tid_s = _candidate_hits(
      mean, u1, u2, e1, e2, min_tile, span, small_valid, w_small, ts, tw)

  # ---- big-gaussian path: fixed capacity, wider window -------------------
  b_cap = config.big_capacity
  w_big = config.big_tile_window
  big_idx, = jnp.nonzero(is_big, size=b_cap, fill_value=n)
  big_present = big_idx < n
  big_overflow = jnp.maximum(is_big.sum(dtype=jnp.int32) - b_cap, 0)

  def gather_pad(x, fill=0.0):
    return jnp.concatenate(
        [x, jnp.full((1, *x.shape[1:]), fill, x.dtype)], 0)[big_idx]

  mean_b = gather_pad(mean)
  u1_b, u2_b = gather_pad(u1), gather_pad(u2)
  e1_b, e2_b = gather_pad(e1[:, None])[:, 0], gather_pad(e2[:, None])[:, 0]
  min_tile_b = gather_pad(min_tile.astype(jnp.int32))
  # clamp the big span to its window (beyond-enormous gaussians are cropped
  # and counted in num_overflow via span_clipped)
  span_b_full = gather_pad(span.astype(jnp.int32))
  span_b = jnp.minimum(span_b_full, w_big)
  span_clipped = jnp.any(span_b_full > w_big, -1) & big_present

  hit_b, tid_b = _candidate_hits(
      mean_b, u1_b, u2_b, e1_b, e2_b, min_tile_b, span_b, big_present,
      w_big, ts, tw)

  # ---- stable single-key sort of the candidate domain ---------------------
  # Points are already depth-ordered and the sort is stable, so a bare tile
  # key yields per-tile depth order.  The depth16 component stays in the key
  # only to interleave big-path candidates (appended after the small block)
  # at their approximate depth (tile_mapper.py:49-66); among small gaussians
  # the stable presort gives EXACT f32 depth order regardless of
  # ``use_depth16``.

  def depth16_of(d):
    return (jnp.clip(d, 0.0, 1.0) * 65535.0).astype(jnp.uint32)

  def make_ops(hit, tid, pid_col, d_col, payload_rows):
    key = (tid.astype(jnp.uint32) << 16) | depth16_of(
        d_col.astype(jnp.float32))
    key = jnp.where(hit, key, jnp.uint32(0xFFFFFFFF))
    pid = jnp.where(hit, pid_col, n)
    ops = (jnp.broadcast_to(key, tid.shape).reshape(-1),
           jnp.broadcast_to(pid, tid.shape).reshape(-1))
    if payload_rows is not None:
      ops = ops + tuple(
          jnp.broadcast_to(payload_rows[:, c:c + 1], tid.shape).reshape(-1)
          for c in range(payload_rows.shape[1]))
    return ops

  payload_b = gather_pad(payload) if payload is not None else None
  ops_s = make_ops(hit_s, tid_s, orig_pid[:, None], depth[:, None], payload)
  d_b = gather_pad(depth[:, None])
  pid_b = gather_pad(orig_pid[:, None].astype(jnp.int32), fill=n)
  ops_b = make_ops(hit_b, tid_b, pid_b, d_b, payload_b)
  ops = tuple(jnp.concatenate([a, b]) for a, b in zip(ops_s, ops_b))

  sorted_ops = jax.lax.sort(ops, num_keys=1)
  # truncate to capacity: valid candidates sort before sentinels; trailing
  # chunk_size rows of slack keep chunk windows in bounds
  sorted_tile = (sorted_ops[0][:p_cap] >> 16).astype(jnp.int32)
  overlap_to_point = jnp.concatenate(
      [sorted_ops[1][:p_cap], jnp.full((2 * g,), n, jnp.int32)])

  sorted_payload = None
  if payload is not None:
    cols = sorted_ops[2:]
    sorted_payload = jnp.concatenate(
        [jnp.stack([c[:p_cap] for c in cols], -1),
         jnp.zeros((2 * g, 7 + f_size), gaussians.dtype)], 0)

  total = (hit_s.sum(dtype=jnp.int32) + hit_b.sum(dtype=jnp.int32))
  num_overflow = (jnp.maximum(total - p_cap, 0) + big_overflow
                  + span_clipped.sum(dtype=jnp.int32))

  # ---- per-tile ranges (reference find_ranges_kernel, :92-112) ------------
  # one searchsorted over T+1 edges: starts = r[:T], ends = r[1:]
  tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
  edges = jnp.searchsorted(sorted_tile,
                           jnp.arange(num_tiles + 1, dtype=jnp.int32),
                           side="left").astype(jnp.int32)
  starts = edges[:num_tiles]
  ends = edges[1:]
  tile_ranges = jnp.stack([starts, ends], -1)
  counts_t = ends - starts

  # ---- chunk-level layout (all K-sized; no per-slot arrays) ---------------
  aligned_chunks = jnp.maximum((counts_t + g - 1) // g, 1)   # (T,)
  chunk_offsets = jnp.concatenate(
      [jnp.zeros((1,), jnp.int32),
       jnp.cumsum(aligned_chunks, dtype=jnp.int32)])         # (T+1,)

  k_chunks = p_cap // g + num_tiles                          # static K
  chunk_ids = jnp.arange(k_chunks, dtype=jnp.int32)

  chunk_tile_fill = _marker_fill(tile_ids, chunk_offsets[:num_tiles],
                                 k_chunks)
  is_dummy = chunk_ids >= chunk_offsets[num_tiles]
  chunk_to_tile = jnp.where(is_dummy, num_tiles, chunk_tile_fill)

  first_chunk = _marker_fill(chunk_offsets[:num_tiles],
                             chunk_offsets[:num_tiles], k_chunks)
  start_fill = _marker_fill(starts, chunk_offsets[:num_tiles], k_chunks)
  end_fill = _marker_fill(ends, chunk_offsets[:num_tiles], k_chunks)

  chunk_src = start_fill + (chunk_ids - first_chunk) * g
  chunk_cnt = jnp.clip(end_fill - chunk_src, 0, g)
  chunk_cnt = jnp.where(is_dummy, 0, chunk_cnt)
  # dummy chunks read block 0 so the pipeline re-uses a cached block
  chunk_src = jnp.where(is_dummy, 0,
                        jnp.clip(chunk_src, 0, p_cap))   # slack covers src+g

  return TileMapping(
      overlap_to_point=overlap_to_point,
      tile_ranges=tile_ranges,
      sorted_payload=sorted_payload,
      chunk_to_tile=chunk_to_tile,
      chunk_src=chunk_src,
      chunk_cnt=chunk_cnt,
      num_overflow=num_overflow,
      num_points=n,
      num_tiles=num_tiles,
      tiles_wide=tw,
      tiles_high=th,
      chunk_size=g,
      small_window=w_small,
      big_window=w_big,
      feature_size=f_size,
  )
