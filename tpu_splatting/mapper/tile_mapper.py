"""Tile mapping: assign depth-sorted gaussians to image tiles (pure jnp).

TPU-native re-design of the reference tile mapper
(/root/reference/taichi_splatting/mapper/tile_mapper.py:27-225 and
taichi_lib/grid_query.py:9-93).  The reference pipeline is:

  per-gaussian OBB tile count -> CUB exclusive scan (total to CPU!) ->
  dynamic allocation -> key-expansion kernel -> CUB radix sort (48/32-bit
  keys) -> range extraction.

That shape cannot exist under XLA (host sync + dynamic allocation), so this
implementation is re-architected around **static capacities + masks**
(SURVEY.md §7):

* Each gaussian tests a fixed ``tile_window``^2 candidate window of tiles
  against its oriented ellipse (the separating-axis OBB test of
  grid_query.py:30-43, reduced to closed interval form: for an affine map,
  the projection of a tile onto an ellipse axis is ``center +- extent`` with
  a *per-gaussian constant* extent, so no corner expansion is needed).
  Gaussians spanning more tiles are routed to a secondary "big" path with a
  wider window and a fixed capacity — overflow is counted and reported, never
  silently mis-rendered as long as ``num_overflow == 0``.

* Overlaps are scattered into a fixed-capacity buffer and sorted by
  ``(tile_id, depth)`` with a two-operand lexicographic ``lax.sort`` —
  replacing the 64-bit CUB radix sort without 64-bit keys.

* Per-tile segments are then re-laid-out into **chunk-aligned** form: every
  tile's overlap list is padded to a multiple of ``chunk_size`` (null
  entries have alpha 0 => compositing no-ops) and every tile owns at least
  one chunk.  This gives the Pallas rasterizer a grid of fixed-size chunks,
  each belonging to exactly one tile, so the whole forward/backward is a
  flash-attention-style pipelined scan with no gather inside the kernel.

Everything is forward-only / non-differentiable, matching the reference
(tile mapping runs under ``torch.no_grad``, tile_mapper.py:181).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

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
    overlap_to_point: (P,) i32 — point index per overlap, sorted by
      (tile, depth); padding entries are ``num_points`` (one past the end).
    tile_ranges: (T, 2) i32 — [start, end) into the sorted overlap list.

  TPU-specific chunk-aligned layout for the Pallas rasterizer:
    point_id_chunked: (A,) i32 — point index per aligned overlap slot;
      null slots are ``num_points``.
    chunk_to_tile: (K,) i32 — owning tile of each chunk; dummy chunks = T.
    chunk_src: (K,) i32 — input-block index for DMA (dummy chunks clamp to
      the last real chunk so their loads are free).
    num_overflow: () i32 — overlaps dropped due to capacity (0 == exact).

  Inverse permutation for gradient reduction (scatters are ~12x slower
  than gathers on TPU, so per-point gradient reduction gathers per-overlap
  gradients back into the dense candidate domain and sums over the window
  axis instead of scatter-adding):
    cand_to_slot: (C,) i32 — aligned slot of each candidate (dense over the
      small window domain N*W^2 followed by the big domain B*Wb^2); misses
      point at the null slot A.
    big_idx: (B,) i32 — gaussian index of each big-path row (n = absent).
  """
  overlap_to_point: jnp.ndarray
  tile_ranges: jnp.ndarray
  point_id_chunked: jnp.ndarray
  chunk_to_tile: jnp.ndarray
  chunk_src: jnp.ndarray
  num_overflow: jnp.ndarray
  cand_to_slot: Optional[jnp.ndarray]
  big_idx: jnp.ndarray

  # static metadata
  num_points: int
  num_tiles: int
  tiles_wide: int
  tiles_high: int
  chunk_size: int
  small_window: int
  big_window: int

  @property
  def num_chunks(self) -> int:
    return self.chunk_to_tile.shape[0]


jax.tree_util.register_dataclass(
    TileMapping,
    data_fields=["overlap_to_point", "tile_ranges", "point_id_chunked",
                 "chunk_to_tile", "chunk_src", "num_overflow",
                 "cand_to_slot", "big_idx"],
    meta_fields=["num_points", "num_tiles", "tiles_wide", "tiles_high",
                 "chunk_size", "small_window", "big_window"])


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


def _candidate_counts_and_hits(mean, u1, u2, e1, e2, min_tile, span, valid,
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
  positions[t] <= s (positions strictly increasing, values nondecreasing).

  Replaces per-slot searchsorted/gather (catastrophically slow on TPU) with
  a tiny scatter + a dense cummax scan.
  """
  buf = jnp.zeros((size,), values.dtype).at[positions].set(
      values, mode="drop", unique_indices=True)
  return jax.lax.cummax(buf)


def _marker_fill_max(values: jnp.ndarray, positions: jnp.ndarray,
                     size: int) -> jnp.ndarray:
  """Like _marker_fill but positions may repeat (empty segments share start
  positions); the largest value wins, which is the containing segment since
  values are nondecreasing in segment index.  values must be >= 0."""
  buf = jnp.zeros((size,), values.dtype).at[positions].max(values,
                                                           mode="drop")
  return jax.lax.cummax(buf)


@partial(jax.jit,
         static_argnames=("image_size", "config", "max_overlaps",
                          "use_depth16", "build_inverse"))
def map_to_tiles(gaussians: jnp.ndarray, depth: jnp.ndarray,
                 image_size: Tuple[int, int], config: RasterConfig,
                 max_overlaps: int | None = None,
                 use_depth16: bool = False,
                 build_inverse: bool = False) -> TileMapping:
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

  Implementation notes (TPU): the whole candidate domain is sorted directly
  (XLA's sort is fast; scatter is not), with misses keyed to a sentinel that
  sorts last; all per-slot layout maps are built with tiny scatters + dense
  cummax scans instead of per-slot binary searches.
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
  p_cap = max_overlaps

  mean, axis, sigma, alpha = g2d.unpack_g2d(gaussians)
  gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
  valid = (alpha > config.alpha_threshold) & (depth > 0) & (gscale > 0)

  u1, u2, e1, e2 = _obb_axes(axis, sigma, gscale, ts)
  min_tile, max_tile = _tile_bounds(mean, axis, sigma, gscale, padded_size, ts)
  span = max_tile - min_tile

  w_small = config.tile_window
  is_big = valid & jnp.any(span > w_small, -1)
  small_valid = valid & ~is_big

  hit_s, tid_s = _candidate_counts_and_hits(
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

  hit_b, tid_b = _candidate_counts_and_hits(
      mean_b, u1_b, u2_b, e1_b, e2_b, min_tile_b, span_b, big_present,
      w_big, ts, tw)

  # ---- sort keys over the whole candidate domain -------------------------
  point_ids = jnp.arange(n, dtype=jnp.int32)

  def depth16_of(d):
    return (jnp.clip(d, 0.0, 1.0) * 65535.0).astype(jnp.int32)

  def make_keys(hit, tid, pid_col, d_col):
    d_col = d_col.astype(jnp.float32)   # 32-bit keys (tile_mapper.py:40-42)
    if use_depth16:
      # packed 32-bit key: tile << 16 | depth16 (tile_mapper.py:49-66)
      key = (tid.astype(jnp.uint32) << 16) | depth16_of(d_col).astype(
          jnp.uint32)
      key = jnp.where(hit, key, jnp.uint32(0xFFFFFFFF))
      keys = (key,)
    else:
      tkey = jnp.where(hit, tid, num_tiles)
      dkey = jax.lax.bitcast_convert_type(d_col, jnp.int32)
      keys = (tkey, jnp.broadcast_to(dkey, tid.shape))
    pid = jnp.where(hit, pid_col, n)
    return tuple(jnp.broadcast_to(k, tid.shape).reshape(-1) for k in keys) \
        + (jnp.broadcast_to(pid, tid.shape).reshape(-1),)

  ops_s = make_keys(hit_s, tid_s, point_ids[:, None], depth[:, None])
  d_b = gather_pad(depth[:, None])
  ops_b = make_keys(hit_b, tid_b, big_idx.astype(jnp.int32)[:, None], d_b)
  ops = tuple(jnp.concatenate([a, b]) for a, b in zip(ops_s, ops_b))
  num_keys = len(ops) - 1

  c_total = ops[0].shape[0]
  if build_inverse:
    # candidate ids ride along so the inverse permutation (candidate ->
    # sorted position) can be recovered with a second sort instead of a
    # scatter (gathers/sorts are far cheaper than scatters on TPU)
    ops = ops + (jnp.arange(c_total, dtype=jnp.int32),)

  sorted_ops = jax.lax.sort(ops, num_keys=num_keys)
  # truncate to capacity: valid candidates sort before sentinels
  if use_depth16:
    sorted_tile = (sorted_ops[0][:p_cap] >> 16).astype(jnp.int32)
  else:
    sorted_tile = sorted_ops[0][:p_cap]
  overlap_to_point = sorted_ops[num_keys][:p_cap]

  total = (hit_s.sum(dtype=jnp.int32) + hit_b.sum(dtype=jnp.int32))
  num_overflow = (jnp.maximum(total - p_cap, 0) + big_overflow
                  + span_clipped.sum(dtype=jnp.int32))

  # ---- per-tile ranges (reference find_ranges_kernel, :92-112) ------------
  tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
  starts = jnp.searchsorted(sorted_tile, tile_ids,
                            side="left").astype(jnp.int32)
  ends = jnp.searchsorted(sorted_tile, tile_ids,
                          side="right").astype(jnp.int32)
  tile_ranges = jnp.stack([starts, ends], -1)
  counts_t = ends - starts

  # ---- chunk-aligned re-layout (scatter-small + cummax, no searchsorted) --
  aligned_counts = jnp.maximum((counts_t + g - 1) // g, 1) * g
  aligned_offsets = jnp.concatenate(
      [jnp.zeros((1,), jnp.int32),
       jnp.cumsum(aligned_counts, dtype=jnp.int32)])

  a_cap = p_cap + num_tiles * g            # static aligned capacity
  num_chunks = a_cap // g
  marker_pos = aligned_offsets[:num_tiles]

  slot = jnp.arange(a_cap, dtype=jnp.int32)
  seg_start = _marker_fill(marker_pos, marker_pos, a_cap)
  src_base = _marker_fill(starts, marker_pos, a_cap)
  # per-slot count via two monotone fills: cnt = ends - starts
  cnt = _marker_fill(ends, marker_pos, a_cap) - src_base

  r = slot - seg_start
  beyond = slot >= aligned_offsets[num_tiles]
  slot_valid = (r < cnt) & ~beyond
  src = jnp.clip(src_base + r, 0, p_cap - 1)
  point_id_chunked = jnp.where(slot_valid, overlap_to_point[src], n)

  chunk_starts = jnp.arange(num_chunks, dtype=jnp.int32) * g
  chunk_tile_fill = _marker_fill(tile_ids, marker_pos, a_cap)
  chunk_to_tile = jnp.where(
      chunk_starts >= aligned_offsets[num_tiles], num_tiles,
      chunk_tile_fill[chunk_starts])

  num_real_chunks = jnp.maximum(aligned_offsets[-1] // g, 1)
  chunk_src = jnp.minimum(jnp.arange(num_chunks, dtype=jnp.int32),
                          num_real_chunks - 1)

  # ---- inverse permutation: candidate -> aligned slot ----------------------
  cand_to_slot = None
  if build_inverse:
    sorted_cand = sorted_ops[-1]
    idx_p = jnp.arange(p_cap, dtype=jnp.int32)
    # per-sorted-position aligned slot (marker fills over the sorted domain;
    # empty tiles share start positions -> max variant)
    a_off_sorted = _marker_fill_max(aligned_offsets[:num_tiles], starts,
                                    p_cap)
    s_start_sorted = _marker_fill_max(starts, starts, p_cap)
    aligned_pos = a_off_sorted + (idx_p - s_start_sorted)
    valid_sorted = sorted_tile < num_tiles
    aligned_pos = jnp.where(valid_sorted, aligned_pos, a_cap)
    aligned_pos_full = jnp.concatenate(
        [aligned_pos, jnp.full((c_total - p_cap,), a_cap, jnp.int32)])
    _, cand_to_slot = jax.lax.sort((sorted_cand, aligned_pos_full),
                                   num_keys=1)

  return TileMapping(
      overlap_to_point=overlap_to_point,
      tile_ranges=tile_ranges,
      point_id_chunked=point_id_chunked,
      chunk_to_tile=chunk_to_tile,
      chunk_src=chunk_src,
      num_overflow=num_overflow,
      cand_to_slot=cand_to_slot,
      big_idx=big_idx.astype(jnp.int32),
      num_points=n,
      num_tiles=num_tiles,
      tiles_wide=tw,
      tiles_high=th,
      chunk_size=g,
      small_window=w_small,
      big_window=w_big,
  )
