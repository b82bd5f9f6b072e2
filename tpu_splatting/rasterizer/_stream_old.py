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
   ``home_tile(14|16b) | y-class(2b) | x-class(2b) | depth(14|12b)`` (u32
   key; see depth_bits_for), full rows riding as payload.  The x-reach class {C, CR, LCR, LC} encodes
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


@dataclass(frozen=True)
class StreamMapping:
  """Static-shape stream mapping (pytree).

  table: (N_pad / RPB, RPB * W_PAD) f32 — home-sorted rows PACKED
    RPB-per-sublane-row, row-major with a pow2 stride W_PAD >=
    row_width, so ``table.reshape(N_pad, W_PAD)[:, :row_width]``
    recovers flat rows: [gaussian(7), features(F), depth rank (low
    depth_bits of the sort key, BY VALUE — exact in f32), zeros...].
    Narrow (N, ~11) arrays pad their lanes 128/11x under the TPU's
    (8, 128) tiling — packing 8 rows per sublane row cuts the
    strip-fetch HBM traffic ~3.6x at rpb=4 (the kernels' dominant
    memory cost — see rows_per_block_for for why rpb caps below 8);
    window copies quantize to RPB-row granularity and per-window validity
    masks handle the head/tail pad rows (exact compositing no-ops).
  pid_order: (N_pad,) i32 — the pid of each sorted table row (the sort's
    permutation; padding rows carry 2n + slot sentinels).  Kept OUT of
    the float table: only the gradient reduce's stage-2 sort reads it.
  desc: (GROUPS, 1, GW*S*W_MAX*4) i32 — compacted fetch-window
    descriptors per (tile-in-group, merged slab): [lo_flat, len,
    gbuf_dst, class(b*3+k)] x W_MAX, nonempty first.  lo_flat indexes the
    kernel's flattened 3-band strip scratch IN ROW UNITS (the kernels
    split it into sublane offset lo // RPB and head lo % RPB); gbuf_dst
    is the backward's RUN_CAP-strided slab-buffer row of the first valid
    row.
  strip_blk: (GROUPS, 3) i32 — S_CAP-block index of each band strip.
  run_starts: (T+1,) i32 — global first-row index of each home's run.
  num_overflow: () i32 — rows dropped by capacity clamps (overflow.sum()).
  overflow: (5,) i32 — the same count split by cause
    [wide/dup, strip, slab, run, window]; see OVERFLOW_CAUSES.
  grad_src: (N,) i32 — per CALLER point, the home-major gradient-buffer
    row (home * run_cap + in-run offset) its backward gradient lands in;
    T * run_cap marks "no row" (culled / run-clamped -> zero gradient).
    Computed at map time so the gradient reduce is pure gathers — no
    R-sized compaction sort, no N-sized pid sort (stream_function.py).
  dup_src / dup_pid: (dup_cap,) i32 — gradient-buffer rows of wide-splat
    duplicate rows and the point each scatter-adds onto (N marks unused).
  """
  table: jnp.ndarray
  pid_order: jnp.ndarray
  desc: jnp.ndarray
  strip_blk: jnp.ndarray
  run_starts: jnp.ndarray
  num_overflow: jnp.ndarray
  overflow: jnp.ndarray
  grad_src: jnp.ndarray
  dup_src: jnp.ndarray
  dup_pid: jnp.ndarray

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
  w_max: int
  run_cap: int
  dup_cap: int = 0
  depth_bits: int = 14
  rows_per_block: int = 4   # rows_per_block_for caps at 4 (w_pad floor 32)

  @property
  def num_groups(self) -> int:
    return self.desc.shape[0]

  @property
  def row_width(self) -> int:
    """Scalars per table row: 7 gaussian + F features + depth rank."""
    return 7 + self.feature_size + 1


jax.tree_util.register_dataclass(
    StreamMapping,
    data_fields=["table", "pid_order", "desc", "strip_blk", "run_starts",
                 "num_overflow", "overflow", "grad_src", "dup_src",
                 "dup_pid"],
    meta_fields=["num_points", "num_tiles", "tiles_wide", "tiles_high",
                 "feature_size", "group_width", "num_slabs", "strip_cap",
                 "slab_cap", "w_max", "run_cap", "dup_cap",
                 "depth_bits", "rows_per_block"])


def rows_per_block_for(row_width: int) -> Tuple[int, int]:
  """(rows per packed sublane row, padded scalars per row).

  A packed sublane row is always exactly 128 lanes (stride = 128/rpb
  pow2-aligned; the kernels' unpack — one transpose + rpb static
  sublane slices — needs that, and Mosaic rejects sublane<->lane
  reshapes outright, benchmarks/exp_pack2.py).

  rpb CAPS AT 4, not the lane-density optimum 8: window copies quantize
  to whole packed rows, and at rpb=8 the ~8-row-per-window padding tax
  (~15 merged windows/tile) pushes typical headline tiles past
  slab_cap.  A split slab covers a single depth cell whose class
  windows can no longer merge (cells are the sort key's innermost
  field), so splitting doubles BOTH the per-tile mask-matmul count and
  the window count (measured: fwd 75 -> 186 ms).  rpb=4 halves the
  padding (tiles stay single-slab), still fetches 3.6x less than the
  unpacked layout, and keeps VMEM small enough for group_width=8."""
  w_pad = 32
  while w_pad < row_width:
    w_pad *= 2
  return max(1, 128 // w_pad), w_pad


def _depth16(d):
  return jnp.clip(d * 65535.0, 0.0, 65535.0).astype(jnp.uint32)


def depth_bits_for(num_tiles: int) -> int:
  """Key layout: home | ycls(2) | xcls(2) | depth in one u32.  Up to
  16,383 tiles the home takes 14 bits and depth 14; beyond (4096 px at
  tile 16 needs 49,152 tiles) the home widens to 16 bits and depth drops
  to 12 — quantized-depth compositing order, same contract as the
  reference's depth16 mode (tile_mapper.py:49-66)."""
  if num_tiles < (1 << 14):
    return 14
  assert num_tiles < (1 << 16), f"tile count {num_tiles} exceeds 16-bit id"
  return 12


# Reach classes (both axes): [C=0, C+pos=1, C+both=2, C+neg=3], so the
# "+pos"-containing classes are [1,3), "+neg"-containing [2,4), all [0,4).
# For homes: k (x index rel. x-1) / b (band index rel. y-1): the home one
# LEFT/UP of the tile must reach +x/+y; one RIGHT/DOWN must reach -x/-y.
CLASS_RANGES = ((1, 3), (0, 4), (2, 4))

# strip scratch slack (the kernels' largest tiered copy)
STRIP_SLACK = 512

# per-cause overflow counter order (StreamMapping.overflow):
#   wide — wide splats beyond wide_cap / clipped spans / dup rows beyond
#          dup_cap (or, with dup_cap == 0, span tiles outside 3x3 cores)
#   strip — band strips longer than 2 * strip_cap
#   slab — single depth cells of one tile exceeding slab_cap
#   run — home runs clamped to run_cap in the backward's slab buffers
#   window — nonempty fetch windows beyond w_max per (tile, slab)
OVERFLOW_CAUSES = ("wide", "strip", "slab", "run", "window")


@functools.partial(
    jax.jit, static_argnames=("image_size", "config", "num_slabs",
                              "strip_cap", "slab_cap", "group_width",
                              "w_max", "run_cap", "build_table",
                              "wide_cap", "dup_cap", "depth_bits"))
def stream_map(gaussians: jnp.ndarray, depth: jnp.ndarray,
               features: jnp.ndarray, image_size: Tuple[int, int],
               config: RasterConfig, num_slabs: int = 1,
               strip_cap: int = 4096, slab_cap: int = 512,
               group_width: int = 8, w_max: int = 64, run_cap: int = 256,
               build_table: bool = True, wide_cap: int = 1024,
               dup_cap: int = 8192, depth_bits: int = 0) -> StreamMapping:
  """Build the stream mapping: ONE N-sized sort + window tables.

  depth: (N,) NDC depth in [0, 1]; <= 0 marks culled points.
  num_slabs: depth bands per tile (ceil(max tile rows / slab_cap); use
    calibrate_stream to size).  Capacities are static; overflow is counted.
  wide_cap / dup_cap: capacities for wide-gaussian handling (splats
    reaching beyond +-1 tile of home; see the duplication block below).
    dup_cap=0 disables duplication (wide splats render their 3x3 core and
    count as overflow).
  """
  n = gaussians.shape[0]
  f_size = features.shape[1]
  ts = config.tile_size
  tw, th = tile_shape(image_size, ts)
  num_tiles = tw * th
  db = depth_bits or depth_bits_for(num_tiles)  # override is test-only
  assert num_tiles < (1 << (28 - db))
  assert tw % group_width == 0, (tw, group_width)
  # the kernels' rank key packs the fetch slot into 11 bits below depth14
  # (stream_kernels._rank_mask); a larger slab would scramble depth order.
  # Calibration runs (build_table=False) never reach the kernels.
  assert slab_cap <= 2048 or not build_table, (
      f"slab_cap {slab_cap} overflows the 11-bit rank-key slot")
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
  # WIDE gaussians (reach beyond +-1 of home, not representable in the 3x3
  # fetch): the main row keeps its clamped classes (covering the 3x3 core)
  # and the span tiles OUTSIDE the core get DUPLICATE rows with
  # centre-only classes, fetched exactly by their own home (the reference
  # expands every overlap the same way, tile_mapper.py:114-146; here only
  # the rare wide splats pay for it).  Gradients of duplicates are
  # scatter-added back onto the point in stream_reduce.
  reach_ok = jnp.all((home - lo_t <= 1) & (hi_t - home <= 1), -1)
  wide = valid & ~reach_ok
  ok = valid
  if dup_cap > 0:
    w_idx, = jnp.nonzero(wide, size=wide_cap, fill_value=n)
    w_idx = w_idx.astype(jnp.int32)   # int64 under x64 (f64 gradcheck runs)
    present = w_idx < n
    far_over = jnp.maximum(wide.sum(dtype=jnp.int32) - wide_cap, 0)

    def gpad(x):
      return jnp.concatenate(
          [x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)[w_idx]

    lo_w, hi_w, home_w = gpad(lo_t), gpad(hi_t), gpad(home)
    span_full = hi_w - lo_w + 1
    w_big = config.big_tile_window
    span_w = jnp.minimum(span_full, w_big)
    clip_over = (jnp.any(span_full > span_w, -1) & present).sum(
        dtype=jnp.int32)
    cnt_w = jnp.where(present, span_w[:, 0] * span_w[:, 1], 0)
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_w, dtype=jnp.int32)])
    total_dup = off[-1]
    dup_over = jnp.maximum(total_dup - dup_cap, 0)

    r = jnp.arange(dup_cap, dtype=jnp.int32)
    w_of = (jnp.searchsorted(off, r, side="right") - 1).astype(jnp.int32)
    w_of = jnp.clip(w_of, 0, wide_cap - 1)
    l = r - off[w_of]
    sx_w = jnp.maximum(span_w[w_of, 0], 1)
    tx = lo_w[w_of, 0] + l % sx_w
    ty = lo_w[w_of, 1] + l // sx_w
    in_core = (jnp.abs(tx - home_w[w_of, 0]) <= 1) & (
        jnp.abs(ty - home_w[w_of, 1]) <= 1)
    dup_ok = (r < total_dup) & ~in_core & present[w_of]
    dup_src = jnp.where(dup_ok, w_idx[w_of], n)
    depth_ext = jnp.concatenate([depth, jnp.zeros((1,), depth.dtype)])
    key_dup = ((ty * tw + tx).astype(jnp.uint32) << (db + 4)) | (
        _depth16(depth_ext[dup_src]) >> (16 - db))
    key_dup = jnp.where(dup_ok, key_dup, jnp.uint32(0xFFFFFFFF))
    # dup pids are offset by n (stream_reduce splits main/dup on this);
    # invalid slots get distinct sentinels past 2n
    pid_dup = jnp.where(dup_ok, dup_src + n, 2 * n + r)
    num_far = far_over + clip_over + dup_over
  else:
    # duplication disabled: wide splats render their 3x3 core only (their
    # uncovered span tiles are counted as overflow)
    num_far = wide.sum(dtype=jnp.int32)

  # per-axis reach classes (CLASS_RANGES order): the y class filters the
  # neighbour-band fetch the same way the x class filters homes — without
  # it every tile fetches whole unfiltered neighbour bands (measured 2.4x
  # pair inflation on small-splat scenes).  Costs 2 depth bits (d14).
  def reach_cls(axis_i):
    neg = lo_t[:, axis_i] < home[:, axis_i]
    pos = hi_t[:, axis_i] > home[:, axis_i]
    return jnp.where(neg & pos, 2, jnp.where(neg, 3,
                                             jnp.where(pos, 1, 0)))

  xcls = reach_cls(0)
  ycls = reach_cls(1)
  home_id = home[:, 1] * tw + home[:, 0]

  key = ((home_id.astype(jnp.uint32) << (db + 4))
         | (ycls.astype(jnp.uint32) << (db + 2))
         | (xcls.astype(jnp.uint32) << db)
         | (_depth16(depth) >> (16 - db)))
  key = jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))

  pid = jnp.arange(n, dtype=jnp.int32)
  w_row = 7 + f_size + 1
  rpb, w_pad = rows_per_block_for(w_row)
  assert slab_cap % rpb == 0 and strip_cap % rpb == 0
  n_rows = n + dup_cap
  if dup_cap > 0:
    key_all = jnp.concatenate([key, key_dup])
    pid_all = jnp.concatenate([pid, pid_dup])
  else:
    key_all, pid_all = key, pid
  if build_table:
    if dup_cap > 0:
      g_ext = jnp.concatenate([gaussians,
                               jnp.zeros((1, 7), gaussians.dtype)], 0)
      f_ext = jnp.concatenate(
          [features, jnp.zeros((1, f_size), features.dtype)],
          0).astype(gaussians.dtype)
      g_cols = tuple(jnp.concatenate([gaussians[:, c], g_ext[dup_src, c]])
                     for c in range(7))
      f_cols = tuple(jnp.concatenate(
          [features.astype(gaussians.dtype)[:, c], f_ext[dup_src, c]])
          for c in range(f_size))
    else:
      g_cols = tuple(gaussians[:, c] for c in range(7))
      f_cols = tuple(features.astype(gaussians.dtype)[:, c]
                     for c in range(f_size))
    ops = (key_all, pid_all) + g_cols + f_cols
    s = jax.lax.sort(ops, num_keys=1)
    skey = s[0]
    # The depth rank rides the float table BY VALUE, never by bitcast:
    # small ints bitcast to f32 DENORMALS, which the TPU flushes to zero
    # in XLA elementwise ops — a silent scramble (found by
    # benchmarks/check_tpu.py).  f32 holds ints exactly up to 2^24, so
    # the rank (< 2^14) is exact; pids live in the separate i32
    # ``pid_order`` column (only the reduce's stage-2 sort reads them).
    key_col = (s[0] & jnp.uint32((1 << db) - 1)).astype(gaussians.dtype)
    pad_key = float((1 << db) - 1)   # sentinel rank; masked anyway
    # pad so any 2-block strip fetch stays in bounds; padding rows are
    # zero (alpha 0 => exact no-ops) with sentinel keys
    n_pad = ((n_rows + strip_cap - 1) // strip_cap + 2) * strip_cap

    def pad_col(c, fill):
      return jnp.concatenate(
          [c, jnp.full((n_pad - n_rows,), fill, c.dtype)])

    cols = [pad_col(c, 0.0) for c in s[2:]] + [pad_col(key_col, pad_key)]
    zero_col = jnp.zeros((n_pad,), gaussians.dtype)
    cols = cols + [zero_col] * (w_pad - w_row)
    # pack RPB rows per sublane row, row-major within the packed row
    # (lane = k * w_pad + w), zero-padded to the pow2 stride w_pad
    table = jnp.stack([c.reshape(-1, rpb) for c in cols], -1).reshape(
        n_pad // rpb, rpb * w_pad)
    pid_order = pad_col(s[1].astype(jnp.int32), 2 * n + dup_cap)
  else:  # calibration: edge tables only
    skey = jax.lax.sort(key_all)
    table = jnp.zeros((1, rpb * w_pad), gaussians.dtype)
    pid_order = jnp.zeros((0,), jnp.int32)

  # ---- class/cell edge table --------------------------------------------
  # d14 depth-quantile cell thresholds: equal quantiles of the VALID depth
  # distribution (culled rows would skew thresholds toward 0, unbalancing
  # every slab) — invalid depths sort to a sentinel above the d14 range and
  # quantile positions index only the first num-valid entries.  Thresholds
  # clamp to the 14-bit depth field so a quantile landing on d14=0x3FFF
  # (far-plane points) can never carry into the xcls bits of the edge key.
  s_edges = num_slabs
  if s_edges > 1:
    dv = _depth16(depth) >> (16 - db)
    dq = jnp.sort(jnp.where(ok, dv, jnp.uint32(0xFFFF)))
    n_valid = ok.sum(dtype=jnp.int32)
    qpos = (jnp.arange(1, s_edges, dtype=jnp.int32) * n_valid) // s_edges
    thr = jnp.minimum(dq[qpos] + 1, jnp.uint32((1 << db) - 1))
  else:
    thr = jnp.zeros((0,), jnp.uint32)

  # one searchsorted over all (home, ycls, xcls, cell) edges; window
  # (h, yc, xc, cell) is the CONSECUTIVE flat pair (monotone by key order)
  hc = jnp.arange(num_tiles * 16, dtype=jnp.uint32)
  base = (hc[:, None] << db)                        # (16T, 1)
  bounds = jnp.concatenate([jnp.zeros((1,), jnp.uint32), thr])
  q = (base | bounds[None, :]).reshape(-1)          # (16T*S,)
  q = jnp.concatenate(
      [q, jnp.asarray([jnp.uint32(num_tiles * 16) << db], jnp.uint32)])
  edges_all = jnp.searchsorted(skey, q, side="left").astype(jnp.int32)

  # ---- per-group strip blocks + local edges -----------------------------
  gw = group_width
  groups_x = tw // gw
  n_groups = th * groups_x
  gy = jnp.arange(n_groups, dtype=jnp.int32) // groups_x
  gx = (jnp.arange(n_groups, dtype=jnp.int32) % groups_x) * gw

  tbl_homes = gw + 2
  dyn = jnp.arange(3, dtype=jnp.int32)[None, :] - 1         # (1, 3)
  band = gy[:, None] + dyn                                  # (G, 3)
  band_ok = (band >= 0) & (band < th)
  h0 = band * tw + jnp.maximum(gx[:, None] - 1, 0)
  e_idx0 = jnp.where(band_ok, h0 * (16 * s_edges), 0)
  start_row = edges_all[e_idx0]
  strip_blk = jnp.where(band_ok, start_row // strip_cap, 0)

  # local edges per band: homes x0-1..x0+gw (out-of-range homes clamp to
  # [0, tw]; tw = next band's start keeps the flat sequence monotone)
  per_home = 16 * s_edges
  hh = (gx[:, None, None] - 1
        + jnp.arange(tbl_homes + 1, dtype=jnp.int32)[None, None, :])
  hid = band[:, :, None] * tw + jnp.clip(hh, 0, tw)          # (G, 3, H+1)
  eidx = (hid[:, :, :tbl_homes] * per_home)[..., None] + jnp.arange(
      per_home, dtype=jnp.int32)[None, None, None, :]
  eidx = eidx.reshape(n_groups, 3, tbl_homes * per_home)
  eidx = jnp.concatenate([eidx, hid[:, :, -1:] * per_home], -1)
  evals = edges_all[jnp.clip(eidx, 0, edges_all.shape[0] - 1)]
  local = evals - (strip_blk * strip_cap)[:, :, None]
  local = jnp.where(band_ok[:, :, None], local, 0)
  local = jnp.clip(local, 0, 2 * strip_cap)

  strip_over = jnp.maximum(
      (evals[:, :, -1] - evals[:, :, 0]) - 2 * strip_cap, 0)

  # ---- fetch-window enumeration (static 64 combos) ----------------------
  # window w = (band b, home k, ycls yc, xcls xc) with yc in
  # CLASS_RANGES[b] and xc in CLASS_RANGES[k]
  wlist = []
  for b in range(3):
    ylo, yhi = CLASS_RANGES[b]
    for k in range(3):
      xlo, xhi = CLASS_RANGES[k]
      for yc in range(ylo, yhi):
        for xc in range(xlo, xhi):
          wlist.append((b, k, yc, xc))
  n_w = len(wlist)                                   # 64

  i_t = jnp.arange(gw, dtype=jnp.int32)              # tile-in-group
  # per-window flat edge bases: (gw, n_w)
  scratch_stride = 2 * strip_cap + STRIP_SLACK

  cell_edges = []                                    # each (G, gw, S+1)
  dsts0 = []
  bks = []
  hvalids = []
  for (b, k, yc, xc) in wlist:
    idx0 = ((i_t + k) * 16 + yc * 4 + xc) * s_edges  # (gw,)
    sel = (idx0[:, None] + jnp.arange(
        s_edges + 1, dtype=jnp.int32)[None, :]).reshape(-1)
    # one 2D gather per window — a (G, gw, L) repeat of ``local`` would
    # materialize G*gw*L i32 per window (16 GB of traffic at 32 slabs)
    ce = jnp.take_along_axis(
        local[:, b, :],
        jnp.broadcast_to(sel[None, :], (n_groups, sel.shape[0])),
        axis=1).reshape(n_groups, gw, s_edges + 1)
    cell_edges.append(ce)                            # (G, gw, S+1)
    run0 = jnp.take_along_axis(
        local[:, b, :], ((i_t + k) * per_home)[None, :], axis=1)
    dsts0.append((i_t + k)[None, :] * run_cap - run0)  # (G, gw) bias
    bks.append(b * 3 + k)
    hx = gx[:, None] + i_t[None, :] - 1 + k
    hvalids.append((hx >= 0) & (hx < tw))

  # counts per (tile, cell) for the greedy plan
  counts = jnp.zeros((n_groups, gw, s_edges), jnp.int32)
  for w in range(n_w):
    ce = cell_edges[w]
    counts = counts + jnp.where(
        hvalids[w][:, :, None], ce[:, :, 1:] - ce[:, :, :-1], 0)

  # --- per-tile slab PLAN: greedy packing of adjacent depth cells --------
  # The cut rule reserves rpb*16 rows of the cap for window-quantization
  # padding (~16 merged windows per single-cell... per slab).  The TRUE
  # padding is rpb x (post-merge window count), which the greedy cannot
  # know (windows merge across classes AND cells only once the packing
  # is fixed); a per-cell window-count allowance overcounts so badly it
  # splits tiles that would fit — and a split slab covers a single depth
  # cell whose class windows can no longer merge (cells are the sort
  # key's innermost field), roughly doubling both slab and window counts
  # (measured fwd 75 -> 186 ms).  When the reserve underestimates,
  # calibration's validation pass sees the exact quantized overflow and
  # escalates num_slabs, then slab_cap.
  pad_reserve = rpb * 16

  def greedy(cnt_cells):
    load = lambda cell: cnt_cells[cell]
    acc = load(0)
    cuts = []
    for cell in range(1, s_edges):
      cut = acc + load(cell) > slab_cap - pad_reserve
      cuts.append(cut)
      acc = jnp.where(cut, load(cell), acc + load(cell))
    bounds_l = [jnp.int32(0)]
    for cell in range(1, s_edges):
      bounds_l.append(jnp.where(cuts[cell - 1], cell, 0))
    bvec = jnp.stack(bounds_l)
    order = jnp.argsort(jnp.where(bvec > 0, bvec, jnp.int32(10 ** 6)))
    compacted = jnp.where(bvec[order] > 0, bvec[order], s_edges)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), compacted[:s_edges - 1],
         jnp.full((1,), s_edges, jnp.int32)])

  plan = jax.vmap(greedy)(counts.reshape(-1, s_edges))
  plan = plan.reshape(n_groups, gw, s_edges + 1)     # (G, gw, S+1)

  # ---- window descriptors per (tile, slab): [lo_flat, len, dst, bk] -----
  lo_all = jnp.stack([ce for ce in cell_edges], 2)   # (G, gw, n_w, S+1)
  p_lo = plan[:, :, None, :s_edges]                  # (G, gw, 1, S)
  p_hi = plan[:, :, None, 1:]
  w_lo = jnp.take_along_axis(lo_all, p_lo, axis=3)   # (G, gw, n_w, S)
  w_hi = jnp.take_along_axis(lo_all, p_hi, axis=3)
  w_len = jnp.maximum(w_hi - w_lo, 0)
  hv = jnp.stack(hvalids, 2)[:, :, :, None]          # (G, gw, n_w, 1)
  w_len = jnp.where(hv, w_len, 0)

  # backward slab-buffer destination
  dst_bias = jnp.stack(dsts0, 2)[:, :, :, None]      # (G, gw, n_w, 1)
  w_dst = w_lo + dst_bias

  # flatten band into the lo so the kernel needs no band index
  b_of = jnp.asarray([b for (b, _, _, _) in wlist], jnp.int32)
  w_lof = w_lo + (b_of * scratch_stride)[None, None, :, None]

  move = jnp.moveaxis  # (G, gw, n_w, S) -> (G, gw, S, n_w)
  w_lof = move(w_lof, 3, 2)
  w_len_m = move(w_len, 3, 2)
  w_dst = move(w_dst, 3, 2)

  # ---- merge adjacent windows -------------------------------------------
  # wlist enumerates each (b, k)'s class windows in KEY order (yc, xc asc),
  # so consecutive windows of the same (b, k) whose strip intervals abut
  # (nothing of an unfetched class/cell in between — always true for
  # single-slab tiles) are ONE contiguous copy.  dst = lo + bias with a
  # per-(b, k) bias, so gbuf destinations stay contiguous across a merge.
  # Emission is positional: slot w-1 holds the chain that ended there (or
  # len 0); the compaction below squeezes the zeros out.
  lo_sl = [w_lof[..., w] for w in range(n_w)]
  len_sl = [w_len_m[..., w] for w in range(n_w)]
  dst_sl = [w_dst[..., w] for w in range(n_w)]
  e_lo, e_len, e_dst, e_k = [], [], [], []
  cur_lo, cur_len, cur_dst = lo_sl[0], len_sl[0], dst_sl[0]
  for w in range(1, n_w):
    if bks[w] == bks[w - 1]:
      cont = lo_sl[w] == cur_lo + cur_len
    else:
      cont = jnp.zeros(cur_lo.shape, bool)
    e_lo.append(jnp.where(cont, 0, cur_lo))
    e_len.append(jnp.where(cont, 0, cur_len))
    e_dst.append(jnp.where(cont, 0, cur_dst))
    e_k.append(wlist[w - 1][1])
    cur_lo = jnp.where(cont, cur_lo, lo_sl[w])
    cur_len = jnp.where(cont, cur_len + len_sl[w], len_sl[w])
    cur_dst = jnp.where(cont, cur_dst, dst_sl[w])
  e_lo.append(cur_lo)
  e_len.append(cur_len)
  e_dst.append(cur_dst)
  e_k.append(wlist[n_w - 1][1])
  w_lof = jnp.stack(e_lo, -1)                        # (G, gw, S, n_w)
  w_len_m = jnp.stack(e_len, -1)
  w_dst = jnp.stack(e_dst, -1)
  bk_of = jnp.broadcast_to(
      jnp.asarray(bks, jnp.int32)[None, None, None, :], w_len_m.shape)

  # run_cap clamp (post-merge; overflow-counted)
  run_hi = ((jnp.asarray(e_k, jnp.int32)[None, None, None, :]
             + i_t[None, :, None, None] + 1) * run_cap)
  len_run = jnp.clip(run_hi - w_dst, 0, None)
  run_over = jnp.maximum(w_len_m - len_run, 0).sum(dtype=jnp.int32)
  w_len_m = jnp.minimum(w_len_m, len_run)

  # ---- chunk long windows -------------------------------------------------
  # The kernels' largest tiered copy is STRIP_SLACK rows, so a merged
  # window longer than WINDOW_CHUNK SPLITS into ceil(len / WINDOW_CHUNK)
  # adjacent descriptors of <= WINDOW_CHUNK rows each.  WINDOW_CHUNK =
  # STRIP_SLACK - rpb is rpb-aligned: every chunk keeps the window's head
  # phase lo % rpb, so each quantized copy (head + len rounded up to whole
  # packed rows) fits the largest fetch tier exactly.  Chunks stay adjacent
  # in slot order (depth rank ties unchanged) and contiguous in both strip
  # rows and gbuf rows (dst advances with lo).  Applied IDENTICALLY in both
  # build_table modes — the r4 heavy-scene failure was a build-only clamp
  # here that calibration could not observe.  cf is bounded by slab_cap:
  # window rows past the slab capacity are slab overflow by definition
  # (clamped + counted below; the cursor accounting then sees the rest).
  # Calibration's unbounded-cap passes (slab_cap > the 2048 rank-key
  # limit, build_table=False only) skip chunking so raw row statistics
  # stay exact — those descriptors are never fetched.
  chunk = STRIP_SLACK - rpb
  if slab_cap <= 2048:
    cf = max(1, -(-slab_cap // chunk))
    chunk_over = jnp.maximum(w_len_m - cf * chunk, 0).sum(dtype=jnp.int32)
    w_len_m = jnp.minimum(w_len_m, cf * chunk)
    pieces = -(-w_len_m // chunk)        # ceil; 0 for empty slots
  else:
    cf = 1
    chunk_over = jnp.int32(0)
    pieces = (w_len_m > 0).astype(jnp.int32)

  # ---- chunk + compact in ONE searchsorted pass ---------------------------
  # Compacted descriptor slot o < w_max holds the (window, piece) pair at
  # rank o of the slot-major piece-minor enumeration of nonempty chunk
  # pieces: a searchsorted over the per-slab inclusive piece cumsum.  The
  # former cf-EXPANDED slot domain (n_w * cf slots per slab — ~100M at the
  # heavy scene's 32 slabs x cf 4) with its stable argsort compaction and
  # four trailing w_max gathers dominated the r4 heavy map's 598 ms; this
  # pass touches only n_w + w_max slots per slab and emits the IDENTICAL
  # descriptor ordering (empty pieces occupy no rank).
  cum_in = jnp.cumsum(pieces, axis=3)                # inclusive (G,gw,S,nw)
  b_rows = n_groups * gw * s_edges
  o = jnp.arange(w_max, dtype=jnp.int32)
  widx = jax.vmap(
      lambda c: jnp.searchsorted(c, o, side="right").astype(jnp.int32))(
          cum_in.reshape(b_rows, n_w))               # (B, w_max)
  in_rng = widx < n_w
  wc = jnp.where(in_rng, widx, n_w - 1)
  gat = lambda a: jnp.take_along_axis(a.reshape(b_rows, n_w), wc, axis=1)
  step = (o[None, :] - gat(cum_in - pieces)) * chunk  # piece offset (rows)
  d_len = jnp.where(in_rng, jnp.clip(gat(w_len_m) - step, 0, chunk), 0)
  live_slot = d_len > 0
  d_lo = jnp.where(live_slot, gat(w_lof) + step, 0)
  d_dst = jnp.where(live_slot, gat(w_dst) + step, 0)
  d_bk = jnp.where(live_slot, gat(bk_of), 0)
  # rows in pieces ranked past w_max (identical count to the expanded
  # form's beyond-w_max compaction tail)
  win_over = w_len_m.sum(dtype=jnp.int32) - d_len.sum(dtype=jnp.int32)
  shape_w = (n_groups, gw, s_edges, w_max)
  d_lo, d_len, d_dst, d_bk = (a.reshape(shape_w)
                              for a in (d_lo, d_len, d_dst, d_bk))

  desc = jnp.stack([d_lo, d_len, d_dst, d_bk], -1)   # (G, gw, S, W, 4)
  desc = desc.reshape(n_groups, 1, gw * s_edges * w_max * 4)

  # quantized slab accounting: each window occupies
  # ceil((lo % rpb + len) / rpb) * rpb assembly rows (the kernels copy
  # whole packed sublane rows); rows past slab_cap are clamped there —
  # count them here with the same cursor arithmetic (unclamped cursors,
  # so cascaded drops overcount conservatively, never under)
  head_q = d_lo % rpb
  len_q = jnp.where(d_len > 0,
                    ((head_q + d_len + rpb - 1) // rpb) * rpb, 0)
  cur_q = jnp.cumsum(len_q, -1) - len_q              # exclusive
  avail_q = jnp.clip(slab_cap - (cur_q + head_q), 0, None)
  slab_over = jnp.maximum(d_len - avail_q, 0).sum(dtype=jnp.int32)
  overflow = jnp.stack([num_far, strip_over.sum(dtype=jnp.int32),
                        slab_over + chunk_over, run_over, win_over])

  # ---- map-time gradient gather indices ---------------------------------
  # The backward's merged gradient buffer is home-major with RUN_CAP
  # strides; sorted row j lands at home(j) * run_cap + (j - run start).
  # Inverting the pid permutation HERE (cheap i32 ops on data the sort
  # already produced) turns the whole gradient reduce into per-column
  # gathers — the R-sized compaction sort and the N-sized pid sort of the
  # f32 gradient columns disappear from the backward graph entirely.
  run_starts = edges_all[0::16 * s_edges]
  zero_i = jnp.zeros((0,), jnp.int32)
  if build_table:
    r_rows = num_tiles * run_cap
    pos = jnp.arange(n_rows, dtype=jnp.int32)
    skey_r = skey[:n_rows]
    home_j = (skey_r >> jnp.uint32(db + 4)).astype(jnp.int32)
    home_c = jnp.clip(home_j, 0, num_tiles - 1)
    row_off = pos - run_starts[home_c]
    ok_row = ((skey_r != jnp.uint32(0xFFFFFFFF)) & (row_off >= 0)
              & (row_off < run_cap) & (home_j < num_tiles))
    gout_row = jnp.where(ok_row, home_c * run_cap + row_off, r_rows)
    pid_sorted = s[1].astype(jnp.int32)
    is_main = pid_sorted < n
    grad_src = jnp.full((n + 1,), r_rows, jnp.int32).at[
        jnp.where(is_main, pid_sorted, n)].set(gout_row)[:n]
    if dup_cap > 0:
      gout_row_ext = jnp.concatenate(
          [gout_row, jnp.full((1,), r_rows, jnp.int32)])
      pid_ext = jnp.concatenate(
          [pid_sorted, jnp.full((1,), 2 * n, jnp.int32)])
      (dpos,) = jnp.nonzero((pid_sorted >= n) & (pid_sorted < 2 * n),
                            size=dup_cap, fill_value=n_rows)
      dpos = dpos.astype(jnp.int32)
      dup_src = gout_row_ext[dpos]
      dup_pid = jnp.where(dpos < n_rows, pid_ext[dpos] - n, n).astype(
          jnp.int32)
    else:
      dup_src = dup_pid = zero_i
  else:
    grad_src = dup_src = dup_pid = zero_i

  return StreamMapping(
      table=table,
      pid_order=pid_order,
      desc=desc,
      strip_blk=strip_blk.astype(jnp.int32),
      run_starts=run_starts,
      num_overflow=overflow.sum(),
      overflow=overflow,
      grad_src=grad_src,
      dup_src=dup_src,
      dup_pid=dup_pid,
      num_points=n,
      num_tiles=num_tiles,
      tiles_wide=tw,
      tiles_high=th,
      feature_size=f_size,
      group_width=gw,
      num_slabs=s_edges,
      strip_cap=strip_cap,
      slab_cap=slab_cap,
      w_max=w_max,
      run_cap=run_cap,
      dup_cap=dup_cap,
      depth_bits=db,
      rows_per_block=rpb,
  )


@functools.partial(jax.jit, static_argnames=("image_size", "config"))
def wide_stats(gaussians, depth, image_size, config: RasterConfig):
  """(num_wide, total_dup_rows, max_span) of the scene: splats whose AABB
  reaches beyond +-1 tile of home, the span tiles outside their 3x3 core
  (clipped to config.big_tile_window per axis), and the largest UNCLIPPED
  per-axis tile span — the quantities that size stream_map's
  wide_cap / dup_cap and config.big_tile_window (spans beyond the window
  are CLIPPED and counted as overflow; calibration must widen the window,
  not the caps, to cover them)."""
  ts = config.tile_size
  mean, axis, sigma, alpha = g2d.unpack_g2d(gaussians)
  gscale = g2d.gaussian_scale(alpha, config.alpha_threshold)
  valid = (alpha > config.alpha_threshold) & (depth.reshape(-1) > 0) & (
      gscale > 0)
  lower, upper = g2d.ellipse_bounds(
      mean, axis * (sigma[:, 0] * gscale)[:, None],
      g2d.perp(axis) * (sigma[:, 1] * gscale)[:, None])
  padded = pad_to_tile(image_size, ts)
  max_tile = (jnp.asarray(padded, jnp.int32) - 1) // ts
  lo_t = jnp.clip(jnp.floor(lower / ts).astype(jnp.int32), 0, max_tile)
  hi_t = jnp.clip(jnp.floor(upper / ts).astype(jnp.int32), 0, max_tile)
  home = jnp.clip(jnp.floor(mean / ts).astype(jnp.int32), 0, max_tile)
  wide = valid & ~jnp.all((home - lo_t <= 1) & (hi_t - home <= 1), -1)
  span_full = hi_t - lo_t + 1
  span = jnp.minimum(span_full, config.big_tile_window)
  # dup SLOTS = full clipped-span product: stream_map allocates a slot
  # for every span cell and invalidates the 3x3-core ones afterwards
  # (stream.py cnt_w / dup_ok), so dup_cap must cover the full product
  dup = span[:, 0] * span[:, 1]
  max_span = jnp.max(jnp.where(wide[:, None], span_full, 0))
  return (wide.sum(dtype=jnp.int32),
          jnp.where(wide, dup, 0).sum(dtype=jnp.int32), max_span)


MAX_SLABS = 32

# Calibration-result compatibility version: bump whenever stream_map's
# capacity/overflow semantics change (window chunking, clamp accounting,
# greedy-plan rules...).  bench.py keys its on-disk calibration cache by
# this, so a semantics change can never silently reuse a stale cal.
CAPACITY_SEMANTICS = 7

# Descriptor slots calibration measures with: the 64 enumerated class
# windows + headroom for chunk splits (per slab, extra chunks <=
# total rows / WINDOW_CHUNK <= slab_cap/(STRIP_SLACK-rpb) <= 5).
W_MAX_LIMIT = 72


def calibrate_stream(gaussians, depth, features, image_size,
                     config: RasterConfig, group_width: int = 8,
                     slab_cap: int = 512, strict: bool = True) -> dict:
  """Measure fetch statistics and suggest static stream capacities.

  Returns {num_slabs (cells), strip_cap, slab_cap, w_max, run_cap,
  wide_cap, dup_cap} such that a stream_map built with them reports
  num_overflow == 0 on this scene (with headroom) — VERIFIED: the final
  pass replays the map at exactly the returned capacities (identical
  overflow semantics to a production build — window chunking and every
  clamp run in both build_table modes) and the loop only exits when every
  per-cause overflow counter reads zero.  When the retry budget exhausts
  with overflow remaining the function RAISES (``strict=False`` returns
  the best capacities with the residual in the "overflow" key instead —
  measurement/diagnostic use only; never benchmark with them).

  Runs entirely on the host CPU (``jax.default_device``): calibration is a
  sizing tool, and compiling the mapper's measurement variant on the TPU
  tunnel costs minutes for no benefit.  Passes: wide-splat stats size
  wide_cap/dup_cap FIRST (duplicate rows change every downstream
  statistic — at checkpoint-statistics scenes they are ~40% of all rows);
  pass 1 with unbounded capacities measures strip/run/row maxima WITH
  duplication active; pass 2 replays the ACTUAL greedy slab plan at the
  chosen (num_slabs, slab_cap), because the per-slab window count the
  kernels need (w_max) is much higher when deep tiles split into multiple
  slabs than pass 1's fully-merged plan would suggest; pass 3 validates
  the complete capacity set against the per-cause overflow counters and
  bumps whichever capacity still overflows."""
  import dataclasses as _dc

  import numpy as np
  cpu = jax.devices("cpu")[0]
  gw = group_width
  n_pts = gaussians.shape[0]
  # dup pids must stay f32-exact (< 2^24, see stream_map's pid assert)
  dup_max = (1 << 23) if 2 * n_pts <= (1 << 23) else (
      (1 << 24) - 2 * n_pts - 1)

  def measure(cfg, num_slabs, s_cap, c_cap, r_cap, wide_cap, dup_cap,
              wm=W_MAX_LIMIT):
    m = stream_map(gaussians, depth, features, image_size, cfg,
                   num_slabs=num_slabs, strip_cap=s_cap, slab_cap=c_cap,
                   group_width=gw, w_max=wm, run_cap=r_cap,
                   build_table=False, wide_cap=wide_cap, dup_cap=dup_cap)
    desc = np.asarray(jax.device_get(m.desc)).reshape(
        m.num_groups, gw, num_slabs, wm, 4)
    return m, desc[..., 1], q_rows(desc, m.rows_per_block)

  def q_rows(desc, rpb):
    # assembly rows a slab actually uses: window copies quantize to
    # whole packed sublane rows (kernels' cursor arithmetic)
    lo, ln = desc[..., 0], desc[..., 1]
    head = lo % rpb
    return np.where(ln > 0, ((head + ln + rpb - 1) // rpb) * rpb,
                    0).sum(3)

  with jax.default_device(cpu):
    gaussians = jax.device_put(gaussians, cpu)
    depth = jax.device_put(depth, cpu)
    features = jax.device_put(features, cpu)

    # ---- pass 0: wide-splat capacities + span window -------------------
    # Sized FIRST so every later measurement includes the duplicate rows.
    # 0 when the scene has none (the dup machinery costs ~20 ms/frame at
    # 2M points even when idle — measured); overflow counters catch drift.
    # config.big_tile_window must cover the scene's largest tile span —
    # spans beyond it are CLIPPED (counted as wide overflow), and no cap
    # increase can recover clipped tiles.
    probe_cfg = _dc.replace(config, big_tile_window=1 << 20)
    n_wide, _, max_span = (int(x) for x in wide_stats(
        gaussians, depth, image_size, probe_cfg))
    btw = max(config.big_tile_window, max_span)
    config = _dc.replace(config, big_tile_window=btw)
    _, n_dup, _ = (int(x) for x in wide_stats(
        gaussians, depth, image_size, config))
    if n_wide == 0:
      wide_cap = dup_cap = 0
    else:
      wide_cap = max(64, 1 << (int(n_wide * 1.3)).bit_length())
      dup_cap = min(dup_max,
                    max(256, 1 << (int(n_dup * 1.3)).bit_length()))

    # ---- pass 1: unbounded capacities -> row/strip/run maxima ----------
    m, lens, _ = measure(config, 4, 1 << 27, 1 << 27, 1 << 27, wide_cap,
                         dup_cap)
    tw, th = m.tiles_wide, m.tiles_high
    max_rows = int(lens.sum((2, 3)).max())

    runs = np.asarray(jax.device_get(
        m.run_starts[1:] - m.run_starts[:-1]))
    max_run = int(runs.max())
    # strips: homes gx-1..gx+gw per band, vectorised over (group, band)
    csum = np.concatenate([[0], np.cumsum(runs)])
    groups_x = tw // gw
    gids = np.arange(m.num_groups)
    gy = gids // groups_x
    x0 = (gids % groups_x) * gw
    strip_len = 0
    for b in range(3):
      band = gy + b - 1
      in_img = (band >= 0) & (band < th)
      a = band * tw + np.maximum(x0 - 1, 0)
      z = band * tw + np.minimum(x0 + gw + 1, tw)
      blens = np.where(in_img, csum[np.where(in_img, z, 0)]
                       - csum[np.where(in_img, a, 0)], 0)
      strip_len = max(strip_len, int(blens.max()))

    strip_cap = 1024
    while strip_cap < strip_len * 1.1:
      strip_cap *= 2
    run_cap = 64
    while run_cap < max_run:
      run_cap *= 2

    # ---- pass 2: replay the actual plan at (num_slabs, slab_cap) -------
    # Start at the UNinflated cell count: every extra slab split roughly
    # doubles the raster step's mask-matmul and window work (measured
    # 215 -> 391 ms/frame at num_slabs 2 -> 4 on the 2M uniform scene),
    # so over-splitting is far more expensive than the extra escalation
    # measure a too-low start occasionally costs.
    num_slabs = min(MAX_SLABS, max(2, 2 * -(-int(max_rows) // slab_cap)))
    for _ in range(6):
      _, lens2, qrows2 = measure(config, num_slabs, 1 << 27, slab_cap,
                                 1 << 27, wide_cap, dup_cap)
      max_slab_rows = int(qrows2.max())   # quantized = kernel cursor use
      if max_slab_rows <= slab_cap or num_slabs >= MAX_SLABS:
        break
      num_slabs = min(MAX_SLABS, num_slabs + 2)  # finer cells split slabs
    # descent: if the converged plan fits, try coarser cells — the
    # escalation (and historical starts) can overshoot, and slab count
    # is the single most expensive capacity at raster time.
    while max_slab_rows <= slab_cap and num_slabs > 2:
      _, lens_t, qrows_t = measure(config, num_slabs - 2, 1 << 27,
                                   slab_cap, 1 << 27, wide_cap, dup_cap)
      if int(qrows_t.max()) > slab_cap:
        break
      num_slabs -= 2
      lens2, max_slab_rows = lens_t, int(qrows_t.max())
    w_max = min(W_MAX_LIMIT, int((lens2 > 0).sum(3).max()) + 2)

    # ---- pass 3: validate the COMPLETE capacity set --------------------
    # Replay at exactly the capacities the caller will use and respond to
    # each per-cause counter: pass 1/2 measured with some caps unbounded,
    # and the interactions (e.g. strip clamps shifting window lengths)
    # only surface with everything bounded at once.
    over = None
    w_seen = 0
    for _ in range(16):
      m3, lens3, qrows3 = measure(config, num_slabs, strip_cap, slab_cap,
                                  run_cap, wide_cap, dup_cap)
      over = np.asarray(jax.device_get(m3.overflow))
      w_seen = int((lens3 > 0).sum(3).max())
      if over.sum() == 0 and w_seen <= w_max:
        break
      if over[0] > 0:                      # wide/dup
        wide_cap = max(64, wide_cap * 2)
        dup_cap = min(dup_max, max(256, dup_cap * 2))
      if over[1] > 0:                      # strip
        strip_cap *= 2
      if over[2] > 0:                      # slab: finer depth cells
        if num_slabs + 4 > MAX_SLABS and slab_cap < 2048:
          # finer cells exhausted: jump straight to the measured
          # quantized per-slab row maximum of the CURRENT plan (the
          # former +128 stepping exhausted the retry budget 155 rows
          # short on the r4 heavy scene); rank-key slot limit 2048
          # (window chunking makes every slab_cap <= 2048 servable)
          # overshoot by one 128-row step: each bump reshapes the greedy
          # plan (and window chunking re-quantizes), so jumping exactly
          # to the measured need chases a slowly-moving tail (observed:
          # 5 residual rows at 1664 with the retry budget exhausted)
          need = int(qrows3.max())
          slab_cap = min(2048,
                         max(slab_cap + 128,
                             -(-need // 128) * 128 + 128))
        num_slabs = min(MAX_SLABS, num_slabs + 4)
      if over[3] > 0:                      # run
        run_cap *= 2
      if over[4] > 0 or w_seen > w_max:    # window
        w_max = min(W_MAX_LIMIT, max(w_max, w_seen) + 2)

    if over is None or over.sum() != 0 or w_seen > w_max:
      msg = (f"calibrate_stream failed to converge: residual overflow "
             f"{[int(x) for x in over]} (causes {OVERFLOW_CAUSES}), "
             f"w_seen {w_seen} vs w_max {w_max} at num_slabs={num_slabs} "
             f"slab_cap={slab_cap} strip_cap={strip_cap} run_cap={run_cap} "
             f"wide_cap={wide_cap} dup_cap={dup_cap}")
      if strict:
        raise RuntimeError(msg)
      import warnings
      warnings.warn(msg)
      # non-strict: re-measure so the reported residual matches the
      # RETURNED capacities (the loop may have bumped past the last
      # measurement)
      m3, lens3, _ = measure(config, num_slabs, strip_cap, slab_cap,
                             run_cap, wide_cap, dup_cap)
      over = np.asarray(jax.device_get(m3.overflow))

  return {"num_slabs": num_slabs, "strip_cap": strip_cap,
          "slab_cap": slab_cap, "w_max": w_max,
          "run_cap": run_cap, "wide_cap": wide_cap, "dup_cap": dup_cap,
          "big_tile_window": btw,
          "overflow": [int(x) for x in over],
          "max_tile_rows": max_rows,
          "max_strip_rows": strip_len, "max_run": max_run,
          "max_slab_rows": max_slab_rows, "num_wide": n_wide,
          "num_dup_rows": n_dup}
