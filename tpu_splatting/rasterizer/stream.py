"""Tile-stream rasterization pipeline: home-sorted points, windowed fetch,
one-shot per-tile compositing, sort-free gradient reduction.

This is the TPU-first re-architecture of the whole rasterization data path
(reference: /root/reference/taichi_splatting/mapper/tile_mapper.py +
rasterizer/forward.py + backward.py).  The sorted-overlap pipeline
(mapper/tile_mapper.py + rasterizer/kernels.py here) mirrors the
reference's *global sort over per-tile overlap lists*; this module removes
the overlap-domain work entirely, based on three measured v5e facts:

* the chunk-grid kernels are pipeline-bound (~0.7 us/chunk of DMA-issue +
  grid overhead, benchmarks/exp_kernel_floor.py),
* XLA sorts cost ~2.6 ms per million rows regardless of payload width —
  the two overlap-domain sorts (candidate expansion, gradient reduction)
  dominate the frame, and
* random row gather/scatter is ~100x off HBM bandwidth, so every data
  movement must be a contiguous window.

Design:

1. **One N-sized sort** orders points by
   ``home_tile(14b) | x-reach-class(2b) | depth16(16b)`` (u32 key), full
   rows riding as payload.  The x-reach class {C, CR, LCR, LC} encodes
   which horizontal neighbours a gaussian's AABB reaches, ordered so that
   every (tile, neighbour-home) fetch is one CONTIGUOUS window (classes
   containing R = [1,3); containing L = [2,4); the home tile itself takes
   [0,4)).  Rows fetched for a tile but not overlapping it are exact
   compositing no-ops — the alpha threshold masks them, which is precisely
   the guarantee behind the reference's conservative OBB culling
   (grid_query.py:30-43), so correctness never depends on culling.

2. **Window tables, not sorts**: per (tile, band, neighbour-home, slab)
   row windows come from ONE searchsorted over the (4*T*S + 1) class/slab
   edges.  Slabs split deep tiles into <= C_CAP-row depth bands (global
   depth16 quantile thresholds) so the per-tile working set is bounded.

3. **The kernels** (stream_kernels.py) iterate 8-tile band-aligned
   groups: 3 band strips stream in as two S_CAP blocks each (6 DMAs per
   GROUP, not 2 per 128-row chunk), every per-tile quantity lives in
   VMEM, and the depth ordering is a *rank-mask matmul*: with
   ``M[i,j] = rank_i < rank_j`` (ranks from a pairwise key compare),
   ``log T = M^T @ log(1-a)`` on the MXU — no sequential scan, no row
   movement, exact freeze semantics.

4. **Gradients come out in fetch order** and are DMA'd to per-class
   slabs of an (N, 9*W) array indexed by HOME-ORDER position: point p's
   gradient = sum of its 9 class slabs + one N-sized inverse sort back to
   the caller's point order.  The A-sized pid sort and the segment-sum
   kernel do not exist in this path.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..data_types import RasterConfig
from ..lib import gaussian2d as g2d
from ..mapper.tile_mapper import pad_to_tile, tile_shape


def _bitcast_f(x):
  return jax.lax.bitcast_convert_type(x, jnp.float32)


def _bitcast_i(x):
  return jax.lax.bitcast_convert_type(x, jnp.int32)


@dataclass(frozen=True)
class StreamMapping:
  """Static-shape stream mapping (pytree).

  table: (N_pad, 7+F+2) f32 — home-sorted rows [gaussian(7), features(F),
    key(bitcast u32: home<<18|xcls<<16|depth16), pid(bitcast i32)].
  edges: (GROUPS, 3, (GW+2)*4*S + 1) i32 — per group, per band (dy-1..+1),
    the class/slab row edges for homes x0-1..x0+GW, LOCAL to the strip's
    first fetched block (so in-kernel offsets index the 2-block scratch
    directly).
  strip_blk: (GROUPS, 3) i32 — S_CAP-block index of each band strip.
  run_starts: (T+1,) i32 — global first-row index of each home's run.
  plan: (GROUPS, GW*(CELLS+1)) i32 — per tile, the first depth CELL of
    each merged slab (greedy <= slab_cap packing), padded with CELLS.
  num_overflow: () i32 — rows dropped by strip/slab capacity clamps.
  """
  table: jnp.ndarray
  edges: jnp.ndarray
  strip_blk: jnp.ndarray
  run_starts: jnp.ndarray
  plan: jnp.ndarray
  num_overflow: jnp.ndarray

  # static metadata
  num_points: int
  num_tiles: int
  tiles_wide: int
  tiles_high: int
  feature_size: int
  group_width: int
  num_slabs: int
  strip_cap: int
  slab_cap: int

  @property
  def num_groups(self) -> int:
    return self.edges.shape[0]


jax.tree_util.register_dataclass(
    StreamMapping,
    data_fields=["table", "edges", "strip_blk", "run_starts", "plan",
                 "num_overflow"],
    meta_fields=["num_points", "num_tiles", "tiles_wide", "tiles_high",
                 "feature_size", "group_width", "num_slabs", "strip_cap",
                 "slab_cap"])


def _depth16(d):
  return jnp.clip(d * 65535.0, 0.0, 65535.0).astype(jnp.uint32)


# Per tile x, the fetched (home, class-range) pairs: home x-1 contributes
# its R-reaching classes [1,3), home x everything [0,4), home x+1 its
# L-reaching classes [2,4).  k = home index relative to x-1.
FETCH_WINDOWS = ((0, 1, 3), (1, 0, 4), (2, 2, 4))


def _tile_slab_counts(local, gx, gw: int, tbl_homes: int, s_edges: int,
                      tw: int):
  """Fetched-row counts per (group, tile-in-group, slab) from the flat
  local edge table (G, 3, H*4*S + 1).  gx: (G,) first tile x per group."""
  e = local[:, :, :-1]
  end = local[:, :, 1:]
  n_groups = local.shape[0]
  cnt = jnp.zeros((n_groups, gw, s_edges), jnp.int32)
  i = jnp.arange(gw)
  for k, clo, chi in FETCH_WINDOWS:
    hx = gx[:, None] + i[None, :] - 1 + k                    # (G, gw)
    hvalid = ((hx >= 0) & (hx < tw))[:, None, :, None]       # (G,1,gw,1)
    for c in range(clo, chi):
      idx = ((i + k) * 4 + c)[:, None] * s_edges + jnp.arange(s_edges)
      width = jnp.maximum(end[:, :, idx] - e[:, :, idx], 0)  # (G,3,gw,S)
      cnt = cnt + jnp.where(hvalid, width, 0).sum(1)
  return cnt


@functools.partial(
    jax.jit, static_argnames=("image_size", "config", "num_slabs",
                              "strip_cap", "slab_cap", "group_width",
                              "build_table"))
def stream_map(gaussians: jnp.ndarray, depth: jnp.ndarray,
               features: jnp.ndarray, image_size: Tuple[int, int],
               config: RasterConfig, num_slabs: int = 1,
               strip_cap: int = 4096, slab_cap: int = 512,
               group_width: int = 8, build_table: bool = True
               ) -> StreamMapping:
  """Build the stream mapping: ONE N-sized sort + window tables.

  depth: (N,) NDC depth in [0, 1]; <= 0 marks culled points.
  num_slabs: depth bands per tile (ceil(max tile rows / slab_cap); use
    calibrate_stream to size).  Capacities are static; overflow is counted.
  """
  n = gaussians.shape[0]
  f_size = features.shape[1]
  ts = config.tile_size
  tw, th = tile_shape(image_size, ts)
  num_tiles = tw * th
  assert num_tiles < (1 << 14), f"tile count {num_tiles} exceeds 14-bit id"
  assert tw % group_width == 0, (tw, group_width)
  depth = depth.reshape(n)

  mean, axis, sigma, alpha = g2d.unpack_g2d(gaussians)
  gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
  valid = (alpha > config.alpha_threshold) & (depth > 0) & (gscale > 0)

  # AABB tile bounds (conservative; exactness never depends on culling)
  lower, upper = g2d.ellipse_bounds(
      mean, axis * (sigma[:, 0] * gscale)[:, None],
      g2d.perp(axis) * (sigma[:, 1] * gscale)[:, None])
  padded = pad_to_tile(image_size, ts)
  max_tile = (jnp.asarray(padded, jnp.int32) - 1) // ts
  lo_t = jnp.clip(jnp.floor(lower / ts).astype(jnp.int32), 0, max_tile)
  hi_t = jnp.clip(jnp.floor(upper / ts).astype(jnp.int32), 0, max_tile)

  home = jnp.clip(jnp.floor(mean / ts).astype(jnp.int32), 0, max_tile)
  # reach beyond +-1 of home is not representable in the 3x3 fetch — count
  # as overflow and drop (the calibrated tile_size keeps radius < ts)
  reach_ok = jnp.all((home - lo_t <= 1) & (hi_t - home <= 1), -1)
  ok = valid & reach_ok
  num_far = (valid & ~reach_ok).sum(dtype=jnp.int32)

  # x-reach class: bit0 = reaches x+1 (R), bit1 = reaches x-1 (L); order
  # [C, CR, LCR, LC] makes R-containing [1,3) and L-containing [2,4)
  reach_l = lo_t[:, 0] < home[:, 0]
  reach_r = hi_t[:, 0] > home[:, 0]
  xcls = jnp.where(reach_l & reach_r, 2,
                   jnp.where(reach_l, 3, jnp.where(reach_r, 1, 0)))
  home_id = home[:, 1] * tw + home[:, 0]

  key = ((home_id.astype(jnp.uint32) << 18)
         | (xcls.astype(jnp.uint32) << 16) | _depth16(depth))
  key = jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))

  pid = jnp.arange(n, dtype=jnp.int32)
  width = 7 + f_size + 2
  if build_table:
    ops = (key, pid) + tuple(gaussians[:, c] for c in range(7)) + tuple(
        features.astype(gaussians.dtype)[:, c] for c in range(f_size))
    s = jax.lax.sort(ops, num_keys=1)
    skey = s[0]
    cols = list(s[2:]) + [_bitcast_f(s[0].astype(jnp.uint32)),
                          _bitcast_f(s[1])]
    table = jnp.stack(cols, -1)                     # (N, 7+F+2)
    # pad so any 2-block strip fetch stays in bounds; padding rows are
    # zero (alpha 0 => exact no-ops) with sentinel keys
    n_pad = ((n + strip_cap - 1) // strip_cap + 2) * strip_cap
    pad_rows = jnp.zeros((n_pad - n, width), table.dtype)
    pad_rows = pad_rows.at[:, 7 + f_size].set(
        _bitcast_f(jnp.uint32(0xFFFFFFFF)))
    table = jnp.concatenate([table, pad_rows], 0)
  else:  # calibration: edge tables only
    skey = jax.lax.sort(key)
    table = jnp.zeros((1, width), gaussians.dtype)

  # ---- class/slab edge table -------------------------------------------
  # global depth16 slab thresholds: equal quantiles of the valid depth16
  # distribution (exact per-tile balance is not required — slab_cap clamps
  # and overflow is counted)
  s_edges = num_slabs
  if s_edges > 1:
    dq = jnp.sort(_depth16(depth).astype(jnp.uint32))
    qpos = (jnp.arange(1, s_edges, dtype=jnp.int32) * n) // s_edges
    thr = dq[qpos].astype(jnp.uint32) + 1          # exclusive upper bounds
  else:
    thr = jnp.zeros((0,), jnp.uint32)

  # query keys: for every (home, cls, slab boundary) the first row >= it.
  # The flat edge array has the property that window (h, c, s) is the
  # CONSECUTIVE pair [flat[(h*4+c)*S + s], flat[(h*4+c)*S + s + 1]) — the
  # end of a class's last slab is the next class's first edge.
  hc = jnp.arange(num_tiles * 4, dtype=jnp.uint32)
  base = (hc[:, None] << 16)                        # (4T, 1)
  bounds = jnp.concatenate([jnp.zeros((1,), jnp.uint32), thr])
  q = (base | bounds[None, :]).reshape(-1)          # (4T*S,)
  q = jnp.concatenate(
      [q, jnp.asarray([jnp.uint32(num_tiles * 4) << 16], jnp.uint32)])
  edges_all = jnp.searchsorted(skey, q, side="left").astype(jnp.int32)

  # ---- per-group strip blocks + local edge tables ----------------------
  gw = group_width
  groups_x = tw // gw
  n_groups = th * groups_x
  gy = jnp.arange(n_groups, dtype=jnp.int32) // groups_x
  gx = (jnp.arange(n_groups, dtype=jnp.int32) % groups_x) * gw

  tbl_homes = gw + 2
  dy = jnp.arange(3, dtype=jnp.int32)[None, :] - 1          # (1, 3)
  band = gy[:, None] + dy                                   # (G, 3)
  band_ok = (band >= 0) & (band < th)
  h0 = band * tw + jnp.maximum(gx[:, None] - 1, 0)          # first home
  # strip start row = edge of (h0, cls 0, slab 0)
  e_idx0 = jnp.where(band_ok, h0 * (4 * s_edges), 0)
  start_row = edges_all[e_idx0]
  strip_blk = jnp.where(band_ok, start_row // strip_cap, 0)

  # local edges: all (home in x0-1..x0+gw, cls, slab) edges + final end.
  # Out-of-range homes clamp to [0, tw]: tw maps to the next band's start
  # edge (= end of this band's last home) so the flat edge sequence stays
  # MONOTONE; their windows are masked out by home validity (see
  # _tile_slab_counts / the kernels) — clamping to tw-1 would both
  # double-fetch edge homes and break monotonicity.
  hh = (gx[:, None, None] - 1
        + jnp.arange(tbl_homes + 1, dtype=jnp.int32)[None, None, :])
  hid = band[:, :, None] * tw + jnp.clip(hh, 0, tw)          # (G, 3, H+1)
  eidx = (hid[:, :, :tbl_homes] * 4)[..., None] * s_edges + jnp.arange(
      4 * s_edges, dtype=jnp.int32)[None, None, None, :]
  eidx = eidx.reshape(n_groups, 3, tbl_homes * 4 * s_edges)
  eidx = jnp.concatenate(
      [eidx, hid[:, :, -1:] * (4 * s_edges)], -1)
  evals = edges_all[jnp.clip(eidx, 0, edges_all.shape[0] - 1)]
  local = evals - (strip_blk * strip_cap)[:, :, None]
  # out-of-image bands: empty windows (start=end=0)
  local = jnp.where(band_ok[:, :, None], local, 0)
  # clamp to the 2-block scratch so in-kernel reads stay in bounds; the
  # clamped rows are the counted strip overflow
  local_cl = jnp.clip(local, 0, 2 * strip_cap)

  strip_over = jnp.maximum(
      (evals[:, :, -1] - evals[:, :, 0]) - 2 * strip_cap, 0)
  # per-(tile, cell) fetched-row counts; the fetch set per (tile x0+i,
  # band) is the (home, class) pairs of FETCH_WINDOWS
  counts = _tile_slab_counts(local, gx, gw, tbl_homes, s_edges,
                             tw)   # (G, gw, CELLS)

  # --- per-tile slab PLAN: greedy packing of adjacent depth cells ---------
  # Global quantile cells are FINE-grained; each tile merges consecutive
  # cells into <= slab_cap-row slabs (plan[j] = first cell of slab j).
  # Without this, shallow tiles pay full slab_cap compute per global slab
  # (~2x padding waste at uniform scenes).  Cells wider than slab_cap on
  # their own are clamped in-kernel and counted as overflow here.
  def greedy(cnt_cells):
    # cnt_cells: (CELLS,) -> plan (CELLS+1,): cell boundaries per slab,
    # padded with CELLS.  Sequential over static CELLS.
    plan = [jnp.int32(0)]
    acc = cnt_cells[0]
    cuts = []
    for cell in range(1, s_edges):
      cut = acc + cnt_cells[cell] > slab_cap
      cuts.append(cut)
      acc = jnp.where(cut, cnt_cells[cell], acc + cnt_cells[cell])
    # slab boundaries: positions where a cut happened, in order
    bounds = [jnp.int32(0)]
    for cell in range(1, s_edges):
      bounds.append(jnp.where(cuts[cell - 1], cell, 0))
    b = jnp.stack(bounds)                       # 0 or cell index
    # compact the nonzero cut positions to the front, pad with CELLS
    order = jnp.argsort(jnp.where(b > 0, b, jnp.int32(10 ** 6)))
    compacted = jnp.where(b[order] > 0, b[order], s_edges)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), compacted[:s_edges - 1],
         jnp.full((1,), s_edges, jnp.int32)])

  flat_counts = counts.reshape(-1, s_edges)
  plan = jax.vmap(greedy)(flat_counts)          # (G*gw, CELLS+1)
  plan = plan.reshape(n_groups, gw * (s_edges + 1))
  slab_over = jnp.maximum(counts - slab_cap, 0).sum(dtype=jnp.int32)

  num_overflow = (num_far + strip_over.sum(dtype=jnp.int32) + slab_over)

  return StreamMapping(
      table=table,
      edges=local_cl,
      strip_blk=strip_blk.astype(jnp.int32),
      run_starts=edges_all[0::4 * s_edges],
      plan=plan,
      num_overflow=num_overflow,
      num_points=n,
      num_tiles=num_tiles,
      tiles_wide=tw,
      tiles_high=th,
      feature_size=f_size,
      group_width=gw,
      num_slabs=s_edges,
      strip_cap=strip_cap,
      slab_cap=slab_cap,
  )


def calibrate_stream(gaussians, depth, features, image_size,
                     config: RasterConfig, group_width: int = 8,
                     slab_cap: int = 512) -> dict:
  """Measure fetch-window statistics and suggest static stream capacities.

  Returns {num_slabs, strip_cap, slab_cap} such that a stream_map built
  with them reports num_overflow == 0 on this scene (with headroom)."""
  m = stream_map(gaussians, depth, features, image_size, config,
                 num_slabs=1, strip_cap=1 << 28, slab_cap=1 << 28,
                 group_width=group_width, build_table=False)
  gw = group_width
  e = m.edges
  strip_len = int(jax.device_get((e[:, :, -1] - e[:, :, 0]).max()))
  gx_cal = (jnp.arange(m.num_groups, dtype=jnp.int32)
            % (m.tiles_wide // gw)) * gw
  counts = _tile_slab_counts(e, gx_cal, gw, gw + 2, 1, m.tiles_wide)
  max_rows = int(jax.device_get(counts.max()))
  # max single home-run length (for run_cap sizing): the flat edge table's
  # consecutive 4*S-stride entries bound each home's run
  eh = e[:, :, 0:(gw + 2) * 4 + 1:4]
  max_run = int(jax.device_get((eh[:, :, 1:] - eh[:, :, :-1]).max()))
  # fine-grained depth cells: the per-tile greedy plan merges adjacent
  # cells into <= slab_cap slabs, so finer cells pack shallow tiles into
  # fewer, fuller slabs (2x finer than the worst tile needs, capped)
  num_slabs = min(12, max(2, 2 * -(-int(max_rows * 1.15) // slab_cap)))
  strip_cap = 1024
  while strip_cap < strip_len * 1.1:
    strip_cap *= 2
  run_cap = 64
  while run_cap < max_run:
    run_cap *= 2
  return {"num_slabs": num_slabs, "strip_cap": strip_cap,
          "slab_cap": slab_cap, "max_tile_rows": max_rows,
          "max_strip_rows": strip_len, "max_run": max_run,
          "run_cap": run_cap}
