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
   ``home_tile(14b) | y-class(2b) | x-class(2b) | depth14`` (u32 key), full
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
  desc: (GROUPS, 1, GW*S*W_MAX*4) i32 — compacted fetch-window
    descriptors per (tile-in-group, merged slab): [lo_flat, len,
    gbuf_dst, class(b*3+k)] x W_MAX, nonempty first.  lo_flat indexes the
    kernel's flattened 3-band strip scratch; gbuf_dst is the backward's
    RUN_CAP-strided slab-buffer row.
  strip_blk: (GROUPS, 3) i32 — S_CAP-block index of each band strip.
  run_starts: (T+1,) i32 — global first-row index of each home's run.
  num_overflow: () i32 — rows dropped by capacity clamps.
  """
  table: jnp.ndarray
  desc: jnp.ndarray
  strip_blk: jnp.ndarray
  run_starts: jnp.ndarray
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
  w_max: int
  run_cap: int

  @property
  def num_groups(self) -> int:
    return self.desc.shape[0]


jax.tree_util.register_dataclass(
    StreamMapping,
    data_fields=["table", "desc", "strip_blk", "run_starts",
                 "num_overflow"],
    meta_fields=["num_points", "num_tiles", "tiles_wide", "tiles_high",
                 "feature_size", "group_width", "num_slabs", "strip_cap",
                 "slab_cap", "w_max", "run_cap"])


def _depth16(d):
  return jnp.clip(d * 65535.0, 0.0, 65535.0).astype(jnp.uint32)


# Reach classes (both axes): [C=0, C+pos=1, C+both=2, C+neg=3], so the
# "+pos"-containing classes are [1,3), "+neg"-containing [2,4), all [0,4).
# For homes: k (x index rel. x-1) / b (band index rel. y-1): the home one
# LEFT/UP of the tile must reach +x/+y; one RIGHT/DOWN must reach -x/-y.
CLASS_RANGES = ((1, 3), (0, 4), (2, 4))

# strip scratch slack (the kernels' largest tiered copy)
STRIP_SLACK = 512


@functools.partial(
    jax.jit, static_argnames=("image_size", "config", "num_slabs",
                              "strip_cap", "slab_cap", "group_width",
                              "w_max", "run_cap", "build_table"))
def stream_map(gaussians: jnp.ndarray, depth: jnp.ndarray,
               features: jnp.ndarray, image_size: Tuple[int, int],
               config: RasterConfig, num_slabs: int = 1,
               strip_cap: int = 4096, slab_cap: int = 512,
               group_width: int = 8, w_max: int = 64, run_cap: int = 256,
               build_table: bool = True) -> StreamMapping:
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

  key = ((home_id.astype(jnp.uint32) << 18)
         | (ycls.astype(jnp.uint32) << 16)
         | (xcls.astype(jnp.uint32) << 14)
         | (_depth16(depth) >> 2))
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

  # ---- class/cell edge table --------------------------------------------
  # d14 depth-quantile cell thresholds: equal quantiles of the valid
  # depth distribution (per-tile balance comes from the greedy slab plan)
  s_edges = num_slabs
  dq = jnp.sort(_depth16(depth).astype(jnp.uint32) >> 2)
  qpos = (jnp.arange(1, s_edges, dtype=jnp.int32) * n) // s_edges
  thr = dq[qpos].astype(jnp.uint32) + 1 if s_edges > 1 else jnp.zeros(
      (0,), jnp.uint32)

  # one searchsorted over all (home, ycls, xcls, cell) edges; window
  # (h, yc, xc, cell) is the CONSECUTIVE flat pair (monotone by key order)
  hc = jnp.arange(num_tiles * 16, dtype=jnp.uint32)
  base = (hc[:, None] << 14)                        # (16T, 1)
  bounds = jnp.concatenate([jnp.zeros((1,), jnp.uint32), thr])
  q = (base | bounds[None, :]).reshape(-1)          # (16T*S,)
  q = jnp.concatenate(
      [q, jnp.asarray([jnp.uint32(num_tiles * 16) << 14], jnp.uint32)])
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
    sel = idx0[None, :, None] + jnp.arange(
        s_edges + 1, dtype=jnp.int32)[None, None, :]
    ce = jnp.take_along_axis(
        local[:, b, :][:, None, :].repeat(gw, 1), sel, axis=2)
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
  def greedy(cnt_cells):
    acc = cnt_cells[0]
    cuts = []
    for cell in range(1, s_edges):
      cut = acc + cnt_cells[cell] > slab_cap
      cuts.append(cut)
      acc = jnp.where(cut, cnt_cells[cell], acc + cnt_cells[cell])
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

  # backward slab-buffer destination + run_cap clamp (overflow-counted)
  dst_bias = jnp.stack(dsts0, 2)[:, :, :, None]      # (G, gw, n_w, 1)
  w_dst = w_lo + dst_bias
  run_hi = (jnp.asarray([k for (_, k, _, _) in wlist], jnp.int32)[
      None, None, :, None] + i_t[None, :, None, None] + 1) * run_cap
  len_run = jnp.clip(run_hi - w_dst, 0, None)
  run_over = jnp.maximum(w_len - len_run, 0).sum(dtype=jnp.int32)
  w_len = jnp.minimum(w_len, len_run)

  # flatten band into the lo so the kernel needs no band index
  b_of = jnp.asarray([b for (b, _, _, _) in wlist], jnp.int32)
  w_lof = w_lo + (b_of * scratch_stride)[None, None, :, None]
  bk_of = jnp.broadcast_to(
      jnp.asarray(bks, jnp.int32)[None, None, :, None], w_len.shape)

  # compact nonempty windows first; drop (and count) beyond w_max
  move = jnp.moveaxis  # (G, gw, n_w, S) -> (G, gw, S, n_w)
  w_lof = move(w_lof, 3, 2)
  w_len_m = move(w_len, 3, 2)
  w_dst = move(w_dst, 3, 2)
  bk_of = move(bk_of, 3, 2)
  order = jnp.argsort(w_len_m == 0, axis=3, stable=True)
  take = lambda a: jnp.take_along_axis(a, order, axis=3)[..., :w_max]
  d_lo, d_len, d_dst, d_bk = (take(w_lof), take(w_len_m), take(w_dst),
                              take(bk_of))
  win_over = jnp.take_along_axis(w_len_m, order, axis=3)[..., w_max:].sum(
      dtype=jnp.int32)

  desc = jnp.stack([d_lo, d_len, d_dst, d_bk], -1)   # (G, gw, S, W, 4)
  desc = desc.reshape(n_groups, 1, gw * s_edges * w_max * 4)

  slab_over = jnp.maximum(counts - slab_cap, 0).sum(dtype=jnp.int32)
  num_overflow = (num_far + strip_over.sum(dtype=jnp.int32) + slab_over
                  + run_over + win_over)

  return StreamMapping(
      table=table,
      desc=desc,
      strip_blk=strip_blk.astype(jnp.int32),
      run_starts=edges_all[0::16 * s_edges],
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
      w_max=w_max,
      run_cap=run_cap,
  )


def calibrate_stream(gaussians, depth, features, image_size,
                     config: RasterConfig, group_width: int = 8,
                     slab_cap: int = 512) -> dict:
  """Measure fetch statistics and suggest static stream capacities.

  Returns {num_slabs (cells), strip_cap, slab_cap, w_max, run_cap} such
  that a stream_map built with them reports num_overflow == 0 on this
  scene (with headroom)."""
  cells = 4
  m = stream_map(gaussians, depth, features, image_size, config,
                 num_slabs=cells, strip_cap=1 << 27, slab_cap=1 << 27,
                 group_width=group_width, w_max=64, run_cap=1 << 27,
                 build_table=False)
  gw = group_width
  tw, th = m.tiles_wide, m.tiles_high

  desc = jax.device_get(m.desc).reshape(m.num_groups, gw, cells, 64, 4)
  lens = desc[..., 1]
  import numpy as np
  tile_rows = lens.sum((2, 3))
  max_rows = int(tile_rows.max())
  w_nonempty = (lens > 0).sum(3).sum(2)          # windows per tile (all
  # cells; a merged slab can hold at most all of them)
  w_max = int((lens > 0).sum(3).max())

  runs = np.asarray(jax.device_get(
      m.run_starts[1:] - m.run_starts[:-1]))
  max_run = int(runs.max())
  # strips: homes gx-1..gx+gw per band
  csum = np.concatenate([[0], np.cumsum(runs)])
  t_ids = np.arange(m.num_tiles)
  bx = t_ids % tw
  lo_h = np.maximum(t_ids - 1, (t_ids // tw) * tw)
  hi_h = np.minimum(t_ids + gw + 1, (t_ids // tw) * tw + tw)
  # per group start tile: bands shift by +-tw; bound by the max over all
  starts = np.arange(0, m.num_tiles, 1)
  strip_len = 0
  for g in range(m.num_groups):
    gy, gxb = divmod(g, tw // gw)
    x0 = gxb * gw
    for b in range(3):
      band = gy + b - 1
      if 0 <= band < th:
        a = band * tw + max(x0 - 1, 0)
        z = band * tw + min(x0 + gw + 1, tw)
        strip_len = max(strip_len, int(csum[z] - csum[a]))

  num_slabs = min(12, max(2, 2 * -(-int(max_rows * 1.15) // slab_cap)))
  strip_cap = 1024
  while strip_cap < strip_len * 1.1:
    strip_cap *= 2
  run_cap = 64
  while run_cap < max_run:
    run_cap *= 2
  return {"num_slabs": num_slabs, "strip_cap": strip_cap,
          "slab_cap": slab_cap, "w_max": min(64, w_max + 2),
          "run_cap": run_cap, "max_tile_rows": max_rows,
          "max_strip_rows": strip_len, "max_run": max_run}
