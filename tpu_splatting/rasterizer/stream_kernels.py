"""Pallas TPU kernels for the tile-stream pipeline (see stream.py).

One grid step processes a GROUP of GW adjacent tiles in a band.  The three
band strips (homes x0-1..x0+GW for bands y-1..y+1) stream in as two
S_CAP-row blocks each — 6 pipelined DMAs per GROUP instead of 2 per
128-row chunk, which removes the measured ~0.7 us/chunk pipeline floor of
the chunk-grid kernels (benchmarks/exp_kernel_floor.py).

The table is PACKED: RPB (usually 4 — see rows_per_block_for for why
not the lane-density optimum 8) consecutive rows share one sublane
row of RPB * row_width lanes.  A flat (N, ~11) f32 table pads its lanes
128/11x under the TPU's (8, 128) tiling, making strip fetches the
kernels' dominant HBM cost (~19 GB/frame at the 2M-splat headline);
packing cuts that ~3.6x.  Window copies quantize to whole packed sublane
rows; per-window validity intervals mask the head/tail pad rows (real
neighbouring rows — exact compositing no-ops once masked).

Per tile, per depth slab:

* <= w_max tiered static-size sublane copies assemble the fetched
  windows in VMEM in FETCH order (packed domain), then ONE contiguous
  reshape (C/RPB, RPB*W) -> (C, W) + transpose unpacks the slab.  Rows
  are kept TRANSPOSED (W, C): per-row scalars live on the lane axis,
  where elementwise coefficient math is ~16x denser than on (C, 1)
  columns.

* Depth ordering is never a data movement: with the pairwise mask
  ``M[i,j] = rank-key_i < rank-key_j`` (rank key = depth16<<14 | slot),
  the exclusive log transmittance is ONE mask matmul
  ``lt_j = sum_i M[i,j] * log(1-a_i)`` on the MXU — no scan, no permute,
  exact freeze semantics.  The backward's remaining-feature state is the
  matching inclusive prefix ``cum_j = wgf_j + sum_i M[i,j] wgf_i``.

* The backward emits gradient rows in fetch order, copies them back into
  per-band RUN_CAP-strided buffers (home-major), and writes one
  STATIC-size DMA per (band, k-neighbour) slab: every (home, band, k)
  cell is owned by exactly one group, so groups never clobber each other
  (edge groups shrink their k=0/k=2 writes by one home).  Point gradients
  = validity-masked sum of the 9 slabs + one row gather back to compact
  home order.  No overlap-sized sort, no segment-sum.

Reference semantics mirrored from
/root/reference/taichi_splatting/rasterizer/forward.py:22-137 and
backward.py:50-227 (remaining-feature trick :166-196, saturation stop
:154-160, heuristics :190-194); see rasterizer/kernels.py for the
chunk-grid equivalents.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data_types import RasterConfig
from ..utils.interpret import use_interpret
from .kernels import _antialias_grads
from .stream import STRIP_SLACK, StreamMapping


def slab_width(config: RasterConfig, f: int) -> int:
  """Columns of the backward's per-row gradient slab: 7 packed-gaussian
  grads + F feature grads [+ visibility] [+ prune_cost, split_score]."""
  heur = config.compute_point_heuristic
  with_vis = heur or config.compute_visibility
  return 7 + f + (1 if with_vis else 0) + (2 if heur else 0)

_NEG_BIG = -3.0e38

# VMEM budget for the shared-assembly scratch/blocks (one group's every
# (tile, slab) block lives in VMEM at once on both ends of the share)
_ASM_VMEM_BUDGET = 6 * 1024 * 1024


def asm_feasible(mapping: "StreamMapping",
                 config: Optional[RasterConfig] = None) -> bool:
  """Whether stream_share_asm fits this mapping's shapes: scenes with
  many depth slabs (large calibrated num_slabs) would need a
  gw*S*c_cap/rpb-row VMEM block per group on both the forward (assembly
  scratch) and backward (input block) — beyond the budget the backward
  re-assembles from strips instead.  The HBM residual (one block per
  GROUP, held between forward and backward) scales with n_groups and is
  budgeted separately against ``config.stream_asm_budget_mb`` (at 4K
  resolution ~6k groups can reach multiple GB)."""
  itemsize = mapping.table.dtype.itemsize
  rows = (mapping.group_width * mapping.num_slabs
          * (mapping.slab_cap // mapping.rows_per_block))
  blk = rows * mapping.table.shape[1] * itemsize
  if blk > _ASM_VMEM_BUDGET:
    return False
  hbm_mb = 2048 if config is None else config.stream_asm_budget_mb
  return mapping.num_groups * blk <= hbm_mb * (1 << 20)
# Copy-back size tiers in ROWS (last == STRIP_SLACK): each gradient
# copy-back moves the smallest tier >= its dynamic length, so
# intermediate tiers trade a few predicated branches for less padding
# traffic (avg window ~30 rows, tail to ~200 — without 128/256 every
# 65+-row window moved 512 rows).
_TIERS = (64, 128, 256, 512)


def _fetch_tiers(rpb: int):
  """Window-copy size tiers in PACKED SUBLANE rows (rpb table rows per
  sublane row; largest tier == STRIP_SLACK rows)."""
  full = STRIP_SLACK // rpb
  return tuple(t for t in (4, 8, 16, 32, 64, 128, 256, 512) if t <= full)




def _log_cut(config: RasterConfig) -> float:
  cut = 1.0 - config.saturate_threshold
  return math.log(cut) if cut > 0.0 else _NEG_BIG


def _mm(a, b, contract, precision=jax.lax.Precision.HIGHEST):
  return jax.lax.dot_general(
      a, b, dimension_numbers=(contract, ((), ())),
      preferred_element_type=jnp.float32 if a.dtype == jnp.bfloat16
      else a.dtype, precision=precision)


def _mask_mm(mask_bf16, x, contract, passes: int = 2):
  """Rank-mask contraction: exact 0/1 left operand; the right operand is
  split into ``passes`` bf16 parts (2 -> ~2^-16 relative, 1 -> ~0.4%).
  CPU interpret stays exact."""
  if use_interpret():
    return _mm(mask_bf16.astype(x.dtype), x, contract)
  hi = x.astype(jnp.bfloat16)
  out = _mm(mask_bf16, hi, contract, precision=jax.lax.Precision.DEFAULT)
  if passes >= 2:
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    out = out + _mm(mask_bf16, lo, contract,
                    precision=jax.lax.Precision.DEFAULT)
  return out.astype(x.dtype)


def _mm2(a, b_exact, contract):
  """2-pass split matmul: ``a`` is split into two bf16 parts (f32-grade
  accuracy); ``b_exact`` MUST be exactly bf16-representable (the centered
  pixel basis is, by construction).  6-pass HIGHEST costs 3x this."""
  if use_interpret():
    return _mm(a, b_exact.astype(a.dtype), contract)
  hi = a.astype(jnp.bfloat16)
  lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
  bb = b_exact.astype(jnp.bfloat16)
  out = _mm(hi, bb, contract, precision=jax.lax.Precision.DEFAULT)
  out = out + _mm(lo, bb, contract, precision=jax.lax.Precision.DEFAULT)
  return out.astype(a.dtype)


def _mm1(a, b, contract):
  """1-pass bf16 matmul with f32 accumulation (~0.4% per-element input
  rounding): for feature/gradient contractions that tolerate bf16-grade
  precision.  CPU interpret stays exact (oracle tests, f64 gradcheck)."""
  if use_interpret():
    return _mm(a, b.astype(a.dtype), contract)
  return _mm(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), contract,
             precision=jax.lax.Precision.DEFAULT).astype(a.dtype)


def _pixel_rows(pix: int, tile_size: int, dtype):
  """(k, PIX) CENTERED tile-local pixel basis rows (lane-major).

  Centred coordinates (+-(tile_size-1)/2) make every basis entry exactly
  bf16-representable (|p| <= 7.5 on 16px tiles, squares and products are
  k*m/4 with k,m odd <= 15 — all within bf16's 8-bit mantissa), so split
  2-pass matmuls against the basis are f32-grade.  Kernels shift the mean
  by +tile_size/2 to match; all formulas use (p - mean) differences, so
  nothing else changes."""
  p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
  half = tile_size * 0.5
  pxl = (p % tile_size).astype(dtype) + 0.5 - half
  pyl = (p // tile_size).astype(dtype) + 0.5 - half
  one = jnp.ones((1, pix), dtype)
  basis3 = jnp.concatenate([pxl, pyl, one], 0)
  basis6 = jnp.concatenate(
      [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl, one], 0)
  return pxl, pyl, basis3, basis6


def _assemble(desc_ref, strip_ref, rows_ref, i, s, *, s_edges: int,
              w_max: int, c_cap: int, rpb: int, do_copy: bool = True,
              base8=None):
  """Copy the fetch windows of (tile i, merged slab s) into rows_ref
  (PACKED rpb-rows-per-sublane domain) in fetch order, driven by the
  mapper's compacted window descriptors [lo_flat, len, gbuf_dst, class].
  Copies quantize to whole packed sublane rows: window rows [lo, lo+len)
  land at assembly slots [slot0, slot0+len) with slot0 = cur8*rpb +
  lo % rpb.  Head/tail pad slots hold REAL neighbouring table rows —
  they become exact compositing no-ops via the validity intervals in the
  returned metadata (list of (slot0, len, gbuf_dst, class)); stale slots
  past a window's tier copy are likewise invalid-masked.

  Tiered static-size sublane copies (rows_ref has _fetch_tiers(rpb)[-1]
  slack sublane rows for the largest tier's overrun).  ``do_copy=False``
  computes the metadata only (scalar desc reads — cheap): the backward
  uses it when it reads the forward's shared assembled blocks instead of
  re-running the copies (config.stream_share_asm).

  ``base8``: assembly destination base in packed sublane rows — the
  shared-assembly forward assembles every (tile, slab) of the group into
  ONE big scratch at per-slab offsets so the group's blocks leave as one
  static full-block output copy (16 dynamic partial writes to an out_ref
  measured +39 ms/frame).  Metadata slots stay slab-relative."""
  tiers = _fetch_tiers(rpb)
  c8_cap = c_cap // rpb
  if base8 is None:
    base8 = jnp.int32(0)
  cur8 = base8
  meta = []
  base = (i * s_edges + s) * (w_max * 4)
  for w in range(w_max):
    lo = desc_ref[0, 0, base + 4 * w]
    lo8 = lo // rpb
    head = lo - lo8 * rpb
    ln = desc_ref[0, 0, base + 4 * w + 1]
    ln = jnp.maximum(
        jnp.minimum(ln, c_cap - ((cur8 - base8) * rpb + head)), 0)
    ln8 = jnp.where(ln > 0, (head + ln + rpb - 1) // rpb, 0)
    if do_copy:
      for t_i, tier in enumerate(tiers):
        lower = tiers[t_i - 1] if t_i else 0

        @pl.when((ln8 > lower) & (ln8 <= tier))
        def _(lo8=lo8, tier=tier, cur8=cur8):
          rows_ref[pl.ds(cur8, tier), :] = strip_ref[pl.ds(lo8, tier), :]
    meta.append(((cur8 - base8) * rpb + head, ln,
                 desc_ref[0, 0, base + 4 * w + 2],
                 desc_ref[0, 0, base + 4 * w + 3]))
    cur8 = cur8 + ln8
  return meta


def _slot_lane(c_cap: int, rpb: int):
  """(1, C) i32 — the FETCH slot held by each unpacked lane.

  The V_a unpack (transpose + rpb sublane slices + lane concat,
  benchmarks/exp_pack2.py) emits lanes in PERMUTED order
  c' = k * (C/rpb) + r8 for fetch slot rpb * r8 + k.  Compositing is
  permutation-invariant (all contractions sum over the row axis), so
  the kernels simply carry this static slot map for the rank keys and
  validity masks; only the backward's gradient rows are permuted back
  (one one-hot matmul) for the contiguous copy-back."""
  cp = jax.lax.broadcasted_iota(jnp.int32, (1, c_cap), 1)
  c8 = c_cap // rpb
  return (cp % c8) * rpb + cp // c8


def _slot_perm(slot_lane, c_cap: int):
  """(C, C') bf16 one-hot P[c, c'] = (slot of lane c' == c): contracting
  away the c' axis restores fetch-slot row order (exact 0/1 operand)."""
  slot_col = jax.lax.broadcasted_iota(jnp.int32, (c_cap, 1), 0)
  return (slot_col == slot_lane).astype(jnp.bfloat16)


def _permT(pm_bf16, x, contract_x: int):
  """dot(P, x) contracting x's c' axis -> (C, k) rows in fetch-slot
  order; 2-pass split bf16 (P is exact 0/1, so this is a ~2^-16-relative
  permutation — gradient-class data only).  CPU interpret stays exact."""
  if use_interpret():
    return _mm(pm_bf16.astype(x.dtype), x, ((1,), (contract_x,)))
  hi = x.astype(jnp.bfloat16)
  out = _mm(pm_bf16, hi, ((1,), (contract_x,)),
            precision=jax.lax.Precision.DEFAULT)
  lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
  out = out + _mm(pm_bf16, lo, ((1,), (contract_x,)),
                  precision=jax.lax.Precision.DEFAULT)
  return out.astype(x.dtype)


def _unpack_rows(rows_ref, c_cap: int, rpb: int, w_row: int, row0=None):
  """Packed (C/rpb, rpb*w_pad) assembly block -> (w_row, C) lane-major
  rows in PERMUTED slot order (see _slot_lane): one 2D transpose + rpb
  static sublane slices + one lane concat — measured FASTER than the
  unpacked layout's (C, W) transpose (0.43 vs 1.0 us/slab) because the
  packed block is an 8x smaller read.

  ``row0``: dynamic sublane offset into a (1, R, lanes) shared-assembly
  block (stream_share_asm) instead of the 2D scratch's row 0."""
  c8 = c_cap // rpb
  w_pad = rows_ref.shape[-1] // rpb
  if row0 is None:
    blk = rows_ref[0:c8, :]
  elif len(rows_ref.shape) == 3:     # (1, R, lanes) shared-asm in-block
    blk = rows_ref[0, pl.ds(row0, c8), :]
  else:                              # big 2D assembly scratch
    blk = rows_ref[pl.ds(row0, c8), :]
  xt = jnp.transpose(blk)                            # (rpb*w_pad, C/rpb)
  return jnp.concatenate(
      [xt[w_pad * k:w_pad * k + w_row, :] for k in range(rpb)], 1)


def _valid_mask(meta, slot_lane):
  """(1, C) bool — lanes holding a window's real rows (quantization pads
  and stale scratch excluded)."""
  v = jnp.zeros(slot_lane.shape, jnp.bool_)
  for (s0, ln, _, _) in meta:
    v = jnp.logical_or(v, (slot_lane >= s0) & (slot_lane < s0 + ln))
  return v


def _rank_mask(rows_t, valid, slot_lane, depth_bits: int = 14):
  """(C, C) bf16 mask M[i,j] = depth-rank_i < depth-rank_j (lane order =
  the unpack's permuted slots; the contraction sums over rows, so order
  only matters through the rank key itself).

  Rank key = depth << 11 | fetch slot (distinct; ties broken by slot);
  invalid lanes rank last (their alpha is masked to 0 anyway).  The
  table's rank column stores the pre-masked depth rank BY VALUE (exact in
  f32 below 2^24; bitcast storage flushes on TPU — see stream_map)."""
  d14 = rows_t[-1:, :].astype(jnp.int32)
  rk = jnp.where(valid, (d14 << 11) | slot_lane, jnp.int32(2 ** 31 - 1))
  rk_col = jnp.transpose(rk)                     # (C, 1)
  return (rk_col < rk).astype(jnp.bfloat16)      # [i, j] = rank_i < rank_j


def _geometry(rows_t, ox, oy):
  """Per-row gaussian components in tile-local coords, lane-major (1, C)."""
  mlx = rows_t[0:1, :] - ox
  mly = rows_t[1:2, :] - oy
  ax = rows_t[2:3, :]
  ay = rows_t[3:4, :]
  sx = rows_t[4:5, :]
  sy = rows_t[5:6, :]
  pa = rows_t[6:7, :]
  return mlx, mly, ax, ay, sx, sy, pa


def _s_sig(x, s):
  z = x / s
  return 1.0 / (1.0 + jnp.exp(-1.6 * z - 0.07 * z * z * z))


def _antialias_pdf(tu, tv, sx_c, sy_c):
  """Pixel-integrated pdf via the approximate Gaussian CDF S_sig
  (reference taichi_lib/generic.py:347-357); tu/tv are UNSCALED
  rotated-frame coords (C, PIX), sx_c/sy_c (C, 1) columns."""
  ix = sx_c * (_s_sig(tu + 0.5, sx_c) - _s_sig(tu - 0.5, sx_c))
  iy = sy_c * (_s_sig(tv + 0.5, sy_c) - _s_sig(tv - 0.5, sy_c))
  return 2.0 * jnp.pi * ix * iy


def _uv_rows(geo, scale: bool):
  """(3, C) linear forms of the rotated-frame coords: u = lu . [px py 1]
  (scaled by 1/sigma when ``scale``, unscaled for the S_sig form)."""
  mlx, mly, ax, ay, sx, sy, _ = geo
  if scale:
    isx = 1.0 / jnp.maximum(sx, 1e-12)
    isy = 1.0 / jnp.maximum(sy, 1e-12)
  else:
    isx = isy = jnp.ones_like(sx)
  lu = jnp.concatenate(
      [ax * isx, ay * isx, -(mlx * ax + mly * ay) * isx], 0)
  lv = jnp.concatenate(
      [-ay * isy, ax * isy, (mlx * ay - mly * ax) * isy], 0)
  return lu, lv


def _alpha(geo, basis3, basis6, config, c_cap: int):
  """(C, PIX) clamped/thresholded compositing alpha + raw alpha (+ the
  antialias aux (tu, tv) when config.antialias).

  Invalid lanes need no explicit row mask here: callers zero them in
  rows_t, so pa = 0 drives a_raw to ~1e-30 (quadratic: exp(log 1e-30);
  antialias: 0 * pdf) — below alpha_threshold, masked by the threshold
  test alone.  (A (C, 1) mask column would cost ~16x the lane-major
  vreg ops — measured +23 ms/frame.)

  Quadratic form: one (6,C)x(6,PIX) matmul + one exp; log point_alpha is
  folded into the constant term (all-zero rows give alpha ~ 0).
  Antialias: two (3,C)x(3,PIX) matmuls + the S_sig integral
  (reference generic.py:340-404)."""
  mlx, mly, ax, ay, sx, sy, pa = geo
  if config.antialias:
    lu, lv = _uv_rows(geo, scale=False)
    tu = _mm2(lu, basis3, ((0,), (0,)))                       # (C, PIX)
    tv = _mm2(lv, basis3, ((0,), (0,)))
    sx_c = jnp.maximum(jnp.transpose(sx), 1e-12)              # (C, 1)
    sy_c = jnp.maximum(jnp.transpose(sy), 1e-12)
    a_raw = jnp.transpose(pa) * _antialias_pdf(tu, tv, sx_c, sy_c)
    aux = (tu, tv)
  else:
    isx2 = 1.0 / jnp.maximum(sx * sx, 1e-24)
    isy2 = 1.0 / jnp.maximum(sy * sy, 1e-24)
    a2 = ax * ax
    b2 = ay * ay
    cxx = -0.5 * (a2 * isx2 + b2 * isy2)
    cyy = -0.5 * (b2 * isx2 + a2 * isy2)
    cxy = -(ax * ay * (isx2 - isy2))
    c_px = -(2.0 * cxx * mlx + cxy * mly)
    c_py = -(2.0 * cyy * mly + cxy * mlx)
    c_1 = (cxx * mlx * mlx + cxy * mlx * mly + cyy * mly * mly
           + jnp.log(jnp.maximum(pa, 1e-30)))
    lq = jnp.concatenate([cxx, cxy, cyy, c_px, c_py, c_1], 0)  # (6, C)
    a_raw = jnp.exp(_mm2(lq, basis6, ((0,), (0,))))            # (C, PIX)
    aux = None
  ok = a_raw > config.alpha_threshold
  a = jnp.where(ok, jnp.minimum(a_raw, config.clamp_max_alpha), 0.0)
  return a, a_raw, aux


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(sb_ref, desc_ref, s0a, s0b, s1a, s1b, s2a, s2b,
                img_ref, cnt_ref, *rest,
                config: RasterConfig, f: int, gw: int, tw: int,
                groups_x: int, s_edges: int, c_cap: int, s_cap: int,
                w_max: int, rpb: int, depth_bits: int = 14,
                ablate: str = "", with_asm: bool = False):
  if with_asm:
    asm_ref, strip_ref, rows_ref, carry_ref = rest
  else:
    asm_ref = None
    strip_ref, rows_ref, carry_ref = rest
  g = pl.program_id(0)
  pix = config.tile_area
  dtype = rows_ref.dtype
  w_row = 7 + f + 1
  if config.use_alpha_blending:
    lcut = _log_cut(config)
  else:
    # quantile mode: skip once transmittance is below the selection
    # threshold everywhere (no selection can fire past it)
    lcut = (math.log(config.saturate_threshold)
            if config.saturate_threshold > 0.0 else _NEG_BIG)
  ts = config.tile_size

  s8 = s_cap // rpb
  stride8 = (2 * s_cap + STRIP_SLACK) // rpb
  for b, (blk_a, blk_b) in enumerate(((s0a, s0b), (s1a, s1b), (s2a, s2b))):
    strip_ref[b * stride8:b * stride8 + s8, :] = blk_a[...]
    strip_ref[b * stride8 + s8:b * stride8 + 2 * s8, :] = blk_b[...]

  cnt_ref[...] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)

  slot_lane = _slot_lane(c_cap, rpb)
  _, _, basis3, basis6 = _pixel_rows(pix, ts, dtype)

  def tile_body(i, _):
    ox = (((g % groups_x) * gw + i) * ts).astype(dtype) + ts * 0.5
    band0 = sb_ref[3 * pl.num_programs(0)]
    oy = ((band0 + g // groups_x) * ts).astype(dtype) + ts * 0.5

    def slab_body(s, _):
      first = s == 0
      # compaction puts nonempty windows first: slab empty iff window 0 is
      slab_used = desc_ref[0, 0, (i * s_edges + s) * (w_max * 4) + 1] > 0
      saturated = jnp.logical_and(
          jnp.logical_not(first), jnp.max(carry_ref[...]) <= lcut)

      def _compute(meta):
        cnt_ref[0, :] += 1.0
        row0 = ((i * s_edges + s) * (c_cap // rpb) if with_asm
                else None)
        rows_t = _unpack_rows(rows_ref, c_cap, rpb, w_row,
                              row0=row0)            # (W, C)
        if ablate == "skeleton":
          img_ref[i, :, :] = rows_t[0:f + 1, 0:pix] * 1e-9
          return
        # zero lanes outside the window validity intervals: quantization
        # pads hold real neighbouring rows (double-composite hazard) and
        # stale scratch may hold NaN bit patterns (0 * NaN = NaN would
        # poison every contraction over the row axis)
        if meta:
          valid = _valid_mask(meta, slot_lane)
        else:                                       # no_assemble ablation
          valid = jnp.ones((1, c_cap), jnp.bool_)
        rows_t = jnp.where(valid, rows_t, 0.0)
        geo = _geometry(rows_t, ox, oy)
        a, _, _ = _alpha(geo, basis3, basis6, config, c_cap)

        l = jnp.log1p(-a)                                   # (C, PIX)
        if ablate == "no_mask":
          lt = l * 0.9
          lt_in = jnp.where(first, jnp.zeros((1, pix), dtype),
                            carry_ref[...])
        elif ablate == "no_alpha":
          a = rows_t[0:1, :].T * jnp.ones((1, pix), dtype) * 1e-6
          l = a * -1.0
          lt = l * 0.9
          lt_in = jnp.where(first, jnp.zeros((1, pix), dtype),
                            carry_ref[...])
        else:
          mask_lt = _rank_mask(rows_t, valid, slot_lane,
                               depth_bits)                    # (C, C)
          lt_in = jnp.where(first, jnp.zeros((1, pix), dtype),
                            carry_ref[...])
          lt = _mask_mm(mask_lt, l, ((0,), (0,)),
                        passes=config.stream_passes) + lt_in
        t = jnp.exp(lt)
        lt_end = lt_in + jnp.sum(l, 0, keepdims=True)

        if config.use_alpha_blending:
          w = jnp.where(lt > lcut, a * t, 0.0)
          feats_t = rows_t[7:7 + f, :]                      # (F, C)
          frow = jnp.concatenate(
              [feats_t, jnp.ones((1, c_cap), dtype)], 0)    # (F+1, C)
          contrib = _mm(frow, w, ((1,), (0,)),
                        precision=jax.lax.Precision.DEFAULT)  # (F+1, PIX)

          @pl.when(first)
          def _():
            img_ref[i, :, :] = contrib

          @pl.when(jnp.logical_not(first))
          def _():
            img_ref[i, :, :] += contrib

          carry_ref[...] = jnp.maximum(
              lt_end,
              jnp.max(jnp.where(lt <= lcut, lt, _NEG_BIG), 0,
                      keepdims=True))
        else:
          # quantile mode (reference forward.py:105-112; sorted-pipeline
          # equivalent kernels.py:287-296): select the feature of the
          # first point where inclusive transmittance crosses
          # saturate_threshold; alpha channel = hit mask.  The carry stays
          # the exact running log transmittance — once every pixel has
          # crossed, max(carry) <= lcut = log(threshold) and the slab skip
          # fires (no further sel can trigger).
          thr = config.saturate_threshold
          t_incl = t * (1.0 - a)
          sel = ((t_incl <= thr) & (t > thr)).astype(dtype)   # (C, PIX)
          feats_t = rows_t[7:7 + f, :]
          contrib = _mm(feats_t, sel, ((1,), (0,)),
                        precision=jax.lax.Precision.DEFAULT)  # (F, PIX)

          @pl.when(first)
          def _():
            img_ref[i, 0:f, :] = contrib

          @pl.when(jnp.logical_not(first))
          def _():
            img_ref[i, 0:f, :] += contrib

          img_ref[i, f:f + 1, :] = (lt_end < 0.0).astype(dtype)
          carry_ref[...] = lt_end

      # empty plan slots (tile fits in fewer merged slabs) skip outright;
      # the first slab still must run to initialise image + carries
      @pl.when(jnp.logical_and(
          jnp.logical_not(saturated), jnp.logical_or(slab_used, first)))
      def _():
        if ablate == "no_assemble":
          meta = []
        elif with_asm:
          # assemble into the big per-group scratch at the slab's base:
          # the whole group leaves as ONE static full-block output copy
          # after the loops (16 dynamic partial writes to an out_ref
          # measured +39 ms/frame); stale lanes are validity-masked by
          # the same descriptor metadata in both kernels
          c8 = c_cap // rpb
          meta = _assemble(
              desc_ref, strip_ref, rows_ref, i, s, s_edges=s_edges,
              w_max=w_max, c_cap=c_cap, rpb=rpb,
              base8=(i * s_edges + s) * c8)
        else:
          meta = _assemble(
              desc_ref, strip_ref, rows_ref, i, s, s_edges=s_edges,
              w_max=w_max, c_cap=c_cap, rpb=rpb)
        _compute(meta)

      return 0

    jax.lax.fori_loop(0, s_edges, slab_body, 0)
    return 0

  jax.lax.fori_loop(0, gw, tile_body, 0)

  if asm_ref is not None:
    asm_ref[0, :, :] = rows_ref[0:asm_ref.shape[1], :]


def _sb_with_band0(strip_blk, band0):
  """Flattened scalar-prefetch table [strip blocks..., band0]: the last
  slot carries the shard's first absolute tile band (0 when unsharded) —
  kernels read it at index 3 * num_programs."""
  flat = strip_blk.reshape(-1)
  b0 = (jnp.zeros((1,), flat.dtype) if band0 is None
        else jnp.asarray(band0, flat.dtype).reshape(1))
  return jnp.concatenate([flat, b0])


def stream_forward(mapping: StreamMapping, config: RasterConfig,
                   ablate: str = "", with_counts: bool = False,
                   band0=None, with_asm: bool = False):
  """Forward rasterization over a stream mapping.

  Returns image_tiled (T, F+1, PIX); channel F is the alpha image.
  ``ablate`` ("no_mask" / "no_alpha") and ``with_counts`` are profiling
  instruments — see benchmarks/bench_stream.py.  ``band0`` (i32 scalar)
  offsets the group grid's band index — band-sharded rendering passes
  each shard's first ABSOLUTE tile band (parallel/stream_sharded.py).

  ``with_asm``: also return the (G, gw*S*c_cap/rpb, 128) assembled slab
  blocks for the backward to read (config.stream_share_asm): the window
  copies and strip DMAs then run ONCE per frame instead of twice."""
  f = mapping.feature_size
  gw = mapping.group_width
  groups_x = mapping.tiles_wide // gw
  s_cap = mapping.strip_cap
  c_cap = mapping.slab_cap
  rpb = mapping.rows_per_block
  pix = config.tile_area
  width = mapping.table.shape[1]        # rpb * row_width packed lanes
  dtype = mapping.table.dtype
  n_groups = mapping.num_groups
  desc_w = mapping.desc.shape[-1]

  kernel = functools.partial(
      _fwd_kernel, config=config, f=f, gw=gw, tw=mapping.tiles_wide,
      groups_x=groups_x, s_edges=mapping.num_slabs, c_cap=c_cap,
      s_cap=s_cap, w_max=mapping.w_max, rpb=rpb,
      depth_bits=mapping.depth_bits, ablate=ablate, with_asm=with_asm)

  def strip_spec(b, which):
    # sb is the FLATTENED (G*3,) strip-block table: 2D scalar-prefetch
    # operands get lane-padded 3->128 in SMEM (3 MB at 6k groups)
    return pl.BlockSpec(
        (s_cap // rpb, width),
        lambda g, sb, b=b, w=which: (sb[g * 3 + b] + w, 0))

  grid_in_specs = [
      pl.BlockSpec((1, 1, desc_w), lambda g, sb: (g, 0, 0),
                   memory_space=pltpu.SMEM),
      strip_spec(0, 0), strip_spec(0, 1),
      strip_spec(1, 0), strip_spec(1, 1),
      strip_spec(2, 0), strip_spec(2, 1),
  ]
  c8 = c_cap // rpb
  asm_rows = gw * mapping.num_slabs * c8
  out_specs = [
      pl.BlockSpec((gw, f + 1, pix), lambda g, sb: (g, 0, 0)),
      pl.BlockSpec((8, 128), lambda g, sb: (g, 0)),
  ]
  out_shape = [
      jax.ShapeDtypeStruct((n_groups * gw, f + 1, pix), dtype),
      jax.ShapeDtypeStruct((n_groups * 8, 128), jnp.float32),
  ]
  if with_asm:
    out_specs.append(pl.BlockSpec((1, asm_rows, width),
                                  lambda g, sb: (g, 0, 0)))
    out_shape.append(
        jax.ShapeDtypeStruct((n_groups, asm_rows, width), dtype))

  # with_asm: the assembly scratch holds EVERY (tile, slab) block of the
  # group at per-slab bases (+ largest-tier overrun slack) so the group
  # leaves as one static full-block output copy
  rows_scratch = ((asm_rows if with_asm else c_cap // rpb)
                  + _fetch_tiers(rpb)[-1])
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n_groups,),
      in_specs=grid_in_specs,
      out_specs=out_specs,
      scratch_shapes=[
          pltpu.VMEM((3 * (2 * s_cap + STRIP_SLACK) // rpb, width),
                     dtype),
          pltpu.VMEM((rows_scratch, width), dtype),
          pltpu.VMEM((1, pix), dtype),
      ],
  )

  outs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=out_shape,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=use_interpret(),
  )(_sb_with_band0(mapping.strip_blk, band0), mapping.desc,
    mapping.table, mapping.table, mapping.table,
    mapping.table, mapping.table, mapping.table)
  image_tiled, counts = outs[0], outs[1]

  if with_asm:
    return (image_tiled, counts, outs[2]) if with_counts else (
        image_tiled, outs[2])
  if with_counts:
    return image_tiled, counts
  return image_tiled


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(sb_ref, desc_ref, *rest,
                config: RasterConfig, f: int, gw: int, tw: int, th: int,
                groups_x: int, s_edges: int, c_cap: int, s_cap: int,
                run_cap: int, slabw: int, w_max: int, rpb: int,
                depth_bits: int = 14, ablate: str = "",
                use_asm: bool = False):
  if use_asm:
    (asm_ref, img_ref, gimg_ref, gout_ref,
     carry_ref, grows_ref) = rest
    strip_ref = rows_ref = None
  else:
    (s0a, s0b, s1a, s1b, s2a, s2b, img_ref, gimg_ref, gout_ref,
     strip_ref, rows_ref, carry_ref, grows_ref) = rest
    asm_ref = None
  g = pl.program_id(0)
  pix = config.tile_area
  dtype = carry_ref.dtype
  w_row = 7 + f + 1
  lcut = _log_cut(config)
  heur = config.compute_point_heuristic
  with_vis = heur or config.compute_visibility
  ts = config.tile_size
  c8 = c_cap // rpb

  if not use_asm:
    s8 = s_cap // rpb
    stride8 = (2 * s_cap + STRIP_SLACK) // rpb
    for b, (blk_a, blk_b) in enumerate(((s0a, s0b), (s1a, s1b),
                                        (s2a, s2b))):
      strip_ref[b * stride8:b * stride8 + s8, :] = blk_a[...]
      strip_ref[b * stride8 + s8:b * stride8 + 2 * s8, :] = blk_b[...]

  gout_ref[...] = jnp.zeros(gout_ref.shape, gout_ref.dtype)

  slot_lane = _slot_lane(c_cap, rpb)
  pm = _slot_perm(slot_lane, c_cap)      # lane c' -> fetch-slot rows
  pxl, pyl, basis3, basis6 = _pixel_rows(pix, ts, dtype)
  ones_pix = jnp.ones((1, pix), dtype)

  def tile_body(i, _):
    ox = (((g % groups_x) * gw + i) * ts).astype(dtype) + ts * 0.5
    band0 = sb_ref[3 * pl.num_programs(0)]
    oy = ((band0 + g // groups_x) * ts).astype(dtype) + ts * 0.5
    gimg = gimg_ref[i]                                      # (F+1, PIX)
    img = img_ref[i]
    s_total = jnp.sum(gimg * img, 0, keepdims=True)         # (1, PIX)

    def slab_body(s, _):
      first = s == 0
      slab_used = desc_ref[0, 0, (i * s_edges + s) * (w_max * 4) + 1] > 0
      saturated = jnp.logical_and(
          jnp.logical_not(first), jnp.max(carry_ref[0:1, :]) <= lcut)

      def _compute(meta):
        if use_asm:                                         # (W, C)
          rows_t = _unpack_rows(asm_ref, c_cap, rpb, w_row,
                                row0=(i * s_edges + s) * c8)
        else:
          rows_t = _unpack_rows(rows_ref, c_cap, rpb, w_row)
        if ablate == "skeleton":
          # assemble + copy-back only: grows depends on rows_t so the
          # window assembly isn't dead code
          grows_ref[0:c_cap, :] = jnp.broadcast_to(
              (jnp.sum(rows_t) * 1e-20).reshape(1, 1), (c_cap, slabw))
          carry_ref[...] = jnp.zeros(carry_ref.shape, dtype)
          _copy_back(meta)
          return
        valid = _valid_mask(meta, slot_lane)
        rows_t = jnp.where(valid, rows_t, 0.0)
        geo = _geometry(rows_t, ox, oy)
        mlx, mly, ax, ay, sx, sy, pa = geo
        if config.antialias:
          a, a_raw, aa_aux = _alpha(geo, basis3, basis6, config, c_cap)
          uv = None
        else:
          # quadratic path: alpha straight from the sigma-scaled rotated
          # coords — the gradient chains need u, v anyway, so
          # pa * exp(-(u^2+v^2)/2) replaces _alpha's basis6 matmul and
          # its folded log(pa) row (one less transcendental per slab;
          # invalid lanes have pa = 0 AND u = v = 0, so a_raw = 0 exactly)
          lu, lv = _uv_rows(geo, scale=True)
          u = _mm2(lu, basis3, ((0,), (0,)))                # (C, PIX)
          v = _mm2(lv, basis3, ((0,), (0,)))
          a_raw = jnp.transpose(pa) * jnp.exp(-0.5 * (u * u + v * v))
          a = jnp.where(a_raw > config.alpha_threshold,
                        jnp.minimum(a_raw, config.clamp_max_alpha), 0.0)
          aa_aux = None
          uv = (lu, lv, u, v)

        l = jnp.log1p(-a)
        lt_in = jnp.where(first, jnp.zeros((1, pix), dtype),
                          carry_ref[0:1, :])
        if ablate == "no_mask":
          mask_lt = None
          lt = l * 0.9 + lt_in
        else:
          mask_lt = _rank_mask(rows_t, valid, slot_lane, depth_bits)
          lt = _mask_mm(mask_lt, l, ((0,), (0,)),
                        passes=config.stream_passes) + lt_in
        t = jnp.exp(lt)
        live = ((lt > lcut) & (a > 0.0)).astype(dtype)
        w = a * t * live

        feats_t = rows_t[7:7 + f, :]
        frow = jnp.concatenate([feats_t, jnp.ones((1, c_cap), dtype)], 0)
        gf = _mm1(frow, gimg, ((0,), (0,)))                 # (C, PIX)
        wgf = w * gf

        # remaining-feature scalar: s_i = total - (prev slabs + inclusive
        # depth prefix of wgf), all in fetch layout
        if ablate == "no_mask":
          cum = wgf * 1.1
        else:
          cum = _mask_mm(mask_lt, wgf, ((0,), (0,)), passes=1) + wgf
        s_prev = jnp.where(first, jnp.zeros((1, pix), dtype),
                           carry_ref[1:2, :])
        s_i = s_total - (cum + s_prev)
        if ablate == "no_grad":
          # everything up to alpha_grad, no per-point gradient chains
          ag = (t * gf - s_i * jnp.exp(-l)) * live
          grows_ref[0:c_cap, :] = jnp.broadcast_to(
              (jnp.sum(ag) * 1e-20).reshape(1, 1), (c_cap, slabw))
          _copy_back(meta)
          lt_end = lt_in + jnp.sum(l, 0, keepdims=True)
          carry_ref[0:1, :] = jnp.maximum(
              lt_end, jnp.max(jnp.where(lt <= lcut, lt, _NEG_BIG), 0,
                              keepdims=True))
          carry_ref[1:2, :] = s_prev + jnp.sum(wgf, 0, keepdims=True)
          return
        # 1/(1-a) = exp(-log1p(-a)): reuses l, cheaper than a VPU divide
        alpha_grad = (t * gf - s_i * jnp.exp(-l)) * live    # (C, PIX)

        # per-point gradients (reference backward.py:180-194)
        z0 = jnp.where(a_raw < config.clamp_max_alpha,
                       alpha_grad * a_raw, 0.0)
        g_feats = _mm1(w, gimg[:f], ((1,), (1,)))           # (C, F)

        if config.antialias:
          # antialias gradients don't factor through u/v moments — use the
          # closed forms (reference generic.py:371-404) as explicit
          # (C, PIX) chains and per-row pixel sums, like the sorted
          # pipeline's kernels.py:482-493
          tu, tv = aa_aux
          clamp_live = (a_raw < config.clamp_max_alpha).astype(dtype)
          pa_c = jnp.transpose(pa)                          # (C, 1)
          ax_c = jnp.transpose(ax)
          ay_c = jnp.transpose(ay)
          sx_c = jnp.maximum(jnp.transpose(sx), 1e-12)
          sy_c = jnp.maximum(jnp.transpose(sy), 1e-12)
          dx = pxl - jnp.transpose(mlx)                     # (C, PIX)
          dy = pyl - jnp.transpose(mly)
          aag = pa_c * alpha_grad * clamp_live
          dmx, dmy, dax, day, dsx, dsy = _antialias_grads(
              tu, tv, sx_c, sy_c, dx, dy, ax_c, ay_c)
          cols = [jnp.sum(aag * dmx, 1, keepdims=True),
                  jnp.sum(aag * dmy, 1, keepdims=True),
                  jnp.sum(aag * dax, 1, keepdims=True),
                  jnp.sum(aag * day, 1, keepdims=True),
                  jnp.sum(aag * dsx, 1, keepdims=True),
                  jnp.sum(aag * dsy, 1, keepdims=True),
                  jnp.sum(z0, 1, keepdims=True)
                  / jnp.maximum(pa_c, 1e-20)]
          parts = [jnp.concatenate(cols, -1), g_feats]      # (C, 7), (C, F)
          if with_vis:
            parts.append(jnp.sum(w, 1, keepdims=True))
          if heur:
            aag_h = pa_c * alpha_grad
            parts.append(jnp.concatenate(
                [jnp.sum(aag_h * aag_h, 1, keepdims=True),
                 jnp.sum(jnp.abs(aag * dmx) + jnp.abs(aag * dmy), 1,
                         keepdims=True)], -1))
        else:
          # quadratic path: factored through pixel moments on the MXU;
          # transposed contractions keep results lane-major (k, C)
          isx = 1.0 / jnp.maximum(sx, 1e-12)
          isy = 1.0 / jnp.maximum(sy, 1e-12)
          lu, lv, u, v = uv            # shared with the alpha computation
          zu = z0 * u
          zv = z0 * v
          mu = _mm1(basis3, zu, ((1,), (1,)))               # (3, C)
          mv = _mm1(basis3, zv, ((1,), (1,)))

          su_px, su_py, su = mu[0:1], mu[1:2], mu[2:3]
          sv_px, sv_py, sv = mv[0:1], mv[1:2], mv[2:3]

          g_mx = ax * isx * su - ay * isy * sv
          g_my = ay * isx * su + ax * isy * sv
          su_dx = su_px - mlx * su
          su_dy = su_py - mly * su
          sv_dx = sv_px - mlx * sv
          sv_dy = sv_py - mly * sv
          g_ax = -isx * su_dx - isy * sv_dy
          g_ay = -isx * su_dy + isy * sv_dx
          suu = lu[0:1] * su_px + lu[1:2] * su_py + lu[2:3] * su
          svv = lv[0:1] * sv_px + lv[1:2] * sv_py + lv[2:3] * sv
          g_sx = isx * suu
          g_sy = isy * svv

          z0s = _mm1(ones_pix, z0, ((1,), (1,)))            # (1, C)
          g_pa = z0s / jnp.maximum(pa, 1e-20)

          cols_t = [g_mx, g_my, g_ax, g_ay, g_sx, g_sy, g_pa]
          if with_vis:
            cols_t.append(_mm1(ones_pix, w, ((1,), (1,))))  # visibility
          if heur:
            # prune = sum_pix (pa * alpha_grad)^2 = pa^2 * sum alpha_grad^2
            # (pa is per-row): one (1, C) row scale instead of two (C, PIX)
            # passes; split reuses zu/zv (z0 * dmx_u = zu*cxa - zv*cya)
            prune = (_mm1(ones_pix, alpha_grad * alpha_grad, ((1,), (1,)))
                     * (pa * pa))
            cxa = jnp.transpose(isx * ax)                 # (C, 1)
            cya = jnp.transpose(isy * ay)
            cxb = jnp.transpose(isx * ay)
            cyb = jnp.transpose(isy * ax)
            split = _mm1(ones_pix,
                         jnp.abs(zu * cxa - zv * cya)
                         + jnp.abs(zu * cxb + zv * cyb),
                         ((1,), (1,)))
            cols_t += [prune, split]
          gt = jnp.concatenate(cols_t, 0)                   # (7[+1+2], C)
          g7 = jnp.transpose(gt[:7, :])
          extras = jnp.transpose(gt[7:, :]) if gt.shape[0] > 7 else None
          parts = [g7, g_feats]
          if extras is not None:
            parts.append(extras)
        # permute the c'-ordered gradient rows back to fetch-slot order
        # (contiguous copy-back ranges); one one-hot matmul, ~2^-16 rel
        grows_ref[0:c_cap, :] = _permT(
            pm, jnp.concatenate(parts, -1), 0)              # (C, slabw)

        if ablate == "no_copyback":
          v = jnp.sum(grows_ref[0:c_cap, :]) * 1e-20
          gout_ref[0, 0:8, :] = jnp.broadcast_to(
              v.reshape(1, 1), (8, gout_ref.shape[-1]))
        else:
          _copy_back(meta)

        lt_end = lt_in + jnp.sum(l, 0, keepdims=True)
        carry_ref[0:1, :] = jnp.maximum(
            lt_end,
            jnp.max(jnp.where(lt <= lcut, lt, _NEG_BIG), 0, keepdims=True))
        carry_ref[1:2, :] = s_prev + jnp.sum(wgf, 0, keepdims=True)

      def _copy_back(meta):
        # copy-back: fetch-order grad rows -> RUN_CAP-strided band buffers.
        # Value-level RMW (a raw tiered copy's overrun tail would clobber
        # the zero-init of neighbouring homes' never-written cells); the
        # class's lane slab is selected by a dynamic lane ROLL + mask —
        # dynamic offsets are only legal on sublanes, and narrow-lane
        # buffers would tile-pad 12.8x, so all 9 slabs share the lane axis.
        for src_cur, ln, dst, bk in meta:
          left = bk * slabw
          for t_i, tier in enumerate(_TIERS):
            lower = _TIERS[t_i - 1] if t_i else 0

            @pl.when((ln > lower) & (ln <= tier))
            def _(src_cur=src_cur, dst=dst, left=left, ln=ln, tier=tier):
              riota = jax.lax.broadcasted_iota(jnp.int32, (tier, 1), 0)
              liota = jax.lax.broadcasted_iota(
                  jnp.int32, (1, 9 * slabw), 1)
              old = gout_ref[0, pl.ds(dst, tier), :]
              new_rows = grows_ref[pl.ds(src_cur, tier), :].astype(
                  old.dtype)
              # dynamic lane rotate needs a 128-aligned lane count
              pad_lanes = ((9 * slabw + 127) // 128) * 128
              padded = jnp.concatenate(
                  [new_rows,
                   jnp.zeros((tier, pad_lanes - slabw), new_rows.dtype)],
                  -1)
              if use_interpret():
                placed = jnp.roll(padded, left, axis=1)
              else:
                placed = pltpu.roll(padded, left, 1)
              placed = placed[:, :9 * slabw]
              keep = jnp.logical_or(
                  riota >= ln,
                  (liota < left) | (liota >= left + slabw))
              gout_ref[0, pl.ds(dst, tier), :] = (
                  jnp.where(keep, old, placed))

      @pl.when(jnp.logical_and(
          jnp.logical_not(saturated), jnp.logical_or(slab_used, first)))
      def _():
        # with use_asm the forward's assembled blocks are read back and
        # only the (cheap, scalar) window metadata is recomputed — the
        # tiered copies and strip DMAs run once per frame, in the forward
        meta = _assemble(
            desc_ref, strip_ref, rows_ref, i, s, s_edges=s_edges,
            w_max=w_max, c_cap=c_cap, rpb=rpb, do_copy=not use_asm)
        _compute(meta)

      return 0

    jax.lax.fori_loop(0, s_edges, slab_body, 0)
    return 0

  jax.lax.fori_loop(0, gw, tile_body, 0)


def _merge_kernel(big, lft, rgt, out_ref, scratch, *, cpg: int, gw: int,
                  rc: int, slabw: int, chunks: int, th: int, halo: bool):
  """Sum the 9 per-class gradient slabs into canonical home-major rows.

  Single-read restructure: the grid walks (chunk, source band) and reads
  each gout band block ONCE (the previous shape read every block three
  times — once per consuming output band; gout is ~2 GB/frame at 2M
  points, so the extra two reads were ~25 ms of pure HBM).  Three
  rotating VMEM accumulators hold the partially-summed output bands
  o = sb + b - 1 [- 1 in halo mode]; after a source band's three class
  contributions land, output band (sb - 1 - halo) is complete -> fold it
  with the one-hot transposing dot and write.

  Per (group c, class b) the own-group contribution is ONE contiguous
  (gw*rc, lanes) row slice big[c, rc:(gw+1)*rc] — home j of group c
  reads its class slabs from rows [(j+1)*rc, (j+2)*rc) (j' = j_src + k =
  j + 1 for every in-group k), and the j-dependent k-validity
  (0 <= j+1-k < gw) becomes a row-dependent lane mask.  Left/right
  neighbour rows at the group edges come from the adjacent group block
  or the skinny edge refs.

  Lane selection is mask-multiply (no per-slab lane slices — each is a
  lane-relayout); the 9-slab fold is ONE transposing one-hot dot per
  (group, home): acc13[cc, p] = sum_r (r % slabw == cc) * t[p, r], on
  the MXU at HIGHEST precision (exact split f32 — gradient sums must
  not round to bf16)."""
  chunk = pl.program_id(0)
  sb = pl.program_id(1)                             # source band step
  h = 1 if halo else 0

  dtype = big.dtype
  lanes = big.shape[-1]                             # 9 * slabw
  K = cpg * gw * rc                                 # rows per accumulator
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
  k9 = lane // slabw                                # class id per lane
  # transposing fold matrix: (slabw, lanes) one-hot on lane % slabw
  frow = jax.lax.broadcasted_iota(jnp.int32, (slabw, lanes), 0)
  flane = jax.lax.broadcasted_iota(jnp.int32, (slabw, lanes), 1)
  fold_t = (flane % slabw == frow).astype(dtype)

  # row-dependent own-group mask for class b: home j = row // rc accepts
  # in-group k lanes with 0 <= j+1-k < gw
  riota = jax.lax.broadcasted_iota(jnp.int32, (gw * rc, 1), 0)
  jrow = riota // rc
  kmod = k9 % 3
  kcls = k9 // 3

  def own_mask(b):
    return ((kcls == b) & (kmod <= jrow + 1)
            & (kmod >= jrow + 2 - gw)).astype(dtype)

  def edge_mask(b, k):
    return (k9 == b * 3 + k).astype(dtype)

  @pl.when(sb == 0)
  def _():
    scratch[...] = jnp.zeros(scratch.shape, dtype)

  for b in range(3):
    o = sb + b - 1 - h                              # output band
    slot = jax.lax.rem((o + 3).astype(jnp.int32), jnp.int32(3))
    ok = (o >= 0) & (o < th)
    if not halo:
      ok = ok & (sb < th)                           # source band exists
    okf = ok.astype(dtype)
    for c in range(cpg):
      base = slot * K + c * gw * rc
      cur = scratch[pl.ds(base, gw * rc), :]
      scratch[pl.ds(base, gw * rc), :] = (
          cur + big[c, rc:(gw + 1) * rc, :] * (own_mask(b) * okf))
      # left neighbour (k=2 slab of the group to the left), home j=0
      if c > 0:
        srcl = big[c - 1, (gw + 1) * rc:(gw + 2) * rc, :]
        okl = okf
      else:
        srcl = lft[0]
        okl = okf * (chunk > 0).astype(dtype)
      cur0 = scratch[pl.ds(base, rc), :]
      scratch[pl.ds(base, rc), :] = cur0 + srcl * (edge_mask(b, 2) * okl)
      # right neighbour (k=0 slab of the group to the right), home gw-1
      if c < cpg - 1:
        srcr = big[c + 1, 0:rc, :]
        okr = okf
      else:
        srcr = rgt[0]
        okr = okf * (chunk < chunks - 1).astype(dtype)
      base_r = base + (gw - 1) * rc
      curw = scratch[pl.ds(base_r, rc), :]
      scratch[pl.ds(base_r, rc), :] = (
          curw + srcr * (edge_mask(b, 0) * okr))

  # output band (sb - 1 - h) is complete: fold, write, recycle its slot
  slot_w = jax.lax.rem((sb - 1 - h + 6).astype(jnp.int32), jnp.int32(3))
  rows_w = scratch[pl.ds(slot_w * K, K), :]
  acc13 = jax.lax.dot_general(
      fold_t, rows_w, dimension_numbers=(((1,), (1,)), ((), ())),
      precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=dtype)                 # (slabw, cpg*gw*rc)
  for c in range(cpg):
    out_ref[:, c, 0, :] = acc13[:, c * gw * rc:(c + 1) * gw * rc]
  scratch[pl.ds(slot_w * K, K), :] = jnp.zeros((K, lanes), dtype)


def merge_grad_slabs(gout, mapping: StreamMapping, run_cap: int,
                     slabw: int, halo: bool = False):
  """Pallas stage 1 of stream_reduce: (G, (gw+2)*rc + slack, 9*slabw)
  slab blocks -> slabw home-major (T*rc,) gradient columns.

  Replaces the XLA shift-add: 9*slabw lane-strided slice reads of a
  Pallas output do NOT fuse into one pass — each reads full (8, 128)
  tiles, ~40x the useful bytes (measured: reduce 84 ms isolated but
  ~360 ms in the grad graph).  The (chunk, source-band) grid with
  rotating accumulators reads gout exactly ONCE (~2 GB at 2M points;
  the previous 3x shape cost ~25 ms more in pure HBM reads)."""
  gw = mapping.group_width
  rc = run_cap
  tw = mapping.tiles_wide
  th = mapping.tiles_high      # OUTPUT bands (local bands when sharded)
  groups_x = tw // gw
  n_groups = th * groups_x     # output groups; gout has th+2 bands of
  # groups in halo mode (band-sharded reduce, parallel/stream_sharded.py)
  n_groups_src = gout.shape[0]
  assert n_groups_src == (th + 2 if halo else th) * groups_x, (
      n_groups_src, th, groups_x, halo)
  lanes = gout.shape[2]
  h = 1 if halo else 0

  used_rows = (gw + 2) * rc   # skip gout's tier-overrun slack rows
  # VMEM: double-buffered big block (2*used_rows) + 3 rotating
  # accumulators (3*gw*rc) per group, all f32 x lanes wide
  cpg = 1
  per_group = (2 * used_rows + 3 * gw * rc) * lanes * 4
  for d in range(1, min(16, groups_x) + 1):
    if groups_x % d == 0 and d * per_group <= 44 * 1024 * 1024:
      cpg = d
  chunks = groups_x // cpg
  n_steps = (th + 2 if halo else th + 1)

  def big_imap(c, s):
    src = s if halo else jnp.clip(s, 0, th - 1)
    return (src * chunks + c, 0, 0)

  def skinny_spec(side):
    def imap(c, s):
      src = s if halo else jnp.clip(s, 0, th - 1)
      if side == 0:   # left: last group of previous chunk, j' = gw+1 rows
        g = src * groups_x + c * cpg - 1
        rb = gw + 1
      else:           # right: first group of next chunk, j' = 0 rows
        g = src * groups_x + (c + 1) * cpg
        rb = 0
      return (jnp.clip(g, 0, n_groups_src - 1), rb, 0)
    return pl.BlockSpec((1, rc, lanes), imap)

  kernel = functools.partial(
      _merge_kernel, cpg=cpg, gw=gw, rc=rc, slabw=slabw, chunks=chunks,
      th=th, halo=halo)

  in_specs = [pl.BlockSpec((cpg, used_rows, lanes), big_imap),
              skinny_spec(0), skinny_spec(1)]
  # ONE slabw-major output (slabw, G, 1, gw*rc): slicing its MAJOR axis
  # into the per-column 1D sort operands is contiguous (free), and the
  # 4D shape keeps the last-two block dims equal to the array dims
  # (Mosaic requires second-minor blocks divisible by 8 otherwise,
  # which small grids' cpg cannot guarantee)
  out_specs = [pl.BlockSpec(
      (slabw, cpg, 1, gw * rc),
      lambda c, s: (0, jnp.clip(s - 1 - h, 0, th - 1) * chunks + c,
                    0, 0))]
  (out,) = pl.pallas_call(
      kernel,
      grid=(chunks, n_steps),
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=[jax.ShapeDtypeStruct((slabw, n_groups, 1, gw * rc),
                                      gout.dtype)],
      scratch_shapes=[pltpu.VMEM((3 * cpg * gw * rc, lanes), gout.dtype)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=use_interpret(),
  )(gout, gout, gout)
  r_rows = n_groups * gw * rc
  return [out[cc].reshape(r_rows) for cc in range(slabw)]


def stream_backward(mapping: StreamMapping, image_tiled, g_image_tiled,
                    config: RasterConfig, run_cap: int, band0=None,
                    ablate: str = "", asm=None):
  """Backward pass: RUN_CAP-strided per-class gradient slabs.

  Returns the per-GROUP slab blocks
  (n_groups, (gw+2)*run_cap + slack, 9*slabw) f32, where
  slabw = 7 + F [+ 2 heuristics] and slab (b, k) row (j*run_cap + r)
  holds tile (gx+j+1-k... ) contributions for home position j (= home
  gx-1+j), in-run offset r.  Use stream_reduce to canonicalise and sum;
  cells of out-of-image tiles are zero or garbage — masked there.

  ``asm``: the forward's shared assembled slab blocks
  (stream_forward(with_asm=True)); when given, the kernel reads them
  instead of re-running the strip DMAs + window copies (the measured
  ~32 ms/frame assembly cost then runs once, in the forward)."""
  f = mapping.feature_size
  gw = mapping.group_width
  tw = mapping.tiles_wide
  groups_x = tw // gw
  s_cap = mapping.strip_cap
  c_cap = mapping.slab_cap
  rpb = mapping.rows_per_block
  pix = config.tile_area
  width = mapping.table.shape[1]
  dtype = mapping.table.dtype
  n_groups = mapping.num_groups
  desc_w = mapping.desc.shape[-1]
  slabw = slab_width(config, f)

  use_asm = asm is not None
  kernel = functools.partial(
      _bwd_kernel, config=config, f=f, gw=gw, tw=tw, th=mapping.tiles_high,
      groups_x=groups_x, s_edges=mapping.num_slabs, c_cap=c_cap,
      s_cap=s_cap, run_cap=run_cap, slabw=slabw, w_max=mapping.w_max,
      rpb=rpb, depth_bits=mapping.depth_bits, ablate=ablate,
      use_asm=use_asm)

  def strip_spec(b, which):
    return pl.BlockSpec(
        (s_cap // rpb, width),
        lambda g, sb, b=b, w=which: (sb[g * 3 + b] + w, 0))

  img_specs = [
      pl.BlockSpec((gw, f + 1, pix), lambda g, sb: (g, 0, 0)),
      pl.BlockSpec((gw, f + 1, pix), lambda g, sb: (g, 0, 0)),
  ]
  if use_asm:
    asm_rows = asm.shape[1]
    in_specs = [
        pl.BlockSpec((1, 1, desc_w), lambda g, sb: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, asm_rows, width), lambda g, sb: (g, 0, 0)),
    ] + img_specs
    inputs = (mapping.desc, asm, image_tiled, g_image_tiled)
    scratch = []
  else:
    in_specs = [
        pl.BlockSpec((1, 1, desc_w), lambda g, sb: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        strip_spec(0, 0), strip_spec(0, 1),
        strip_spec(1, 0), strip_spec(1, 1),
        strip_spec(2, 0), strip_spec(2, 1),
    ] + img_specs
    inputs = (mapping.desc,
              mapping.table, mapping.table, mapping.table,
              mapping.table, mapping.table, mapping.table,
              image_tiled, g_image_tiled)
    scratch = [
        pltpu.VMEM((3 * (2 * s_cap + STRIP_SLACK) // rpb, width),
                   dtype),
        pltpu.VMEM((c_cap // rpb + _fetch_tiers(rpb)[-1], width),
                   dtype),
    ]

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n_groups,),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, (gw + 2) * run_cap + _TIERS[-1], 9 * slabw),
                       lambda g, sb: (g, 0, 0)),
      ],
      scratch_shapes=scratch + [
          pltpu.VMEM((2, pix), dtype),
          pltpu.VMEM((c_cap + _TIERS[-1], slabw), dtype),
      ],
  )

  # NB: slab storage stays f32 — bf16's (16,128) tiling rejects the
  # copy-back's unaligned dynamic sublane offsets, and the columnar
  # reduce already keeps HBM temps dense.
  out_dtype = dtype
  (gout,) = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct(
              (n_groups, (gw + 2) * run_cap + _TIERS[-1], 9 * slabw),
              out_dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=use_interpret(),
  )(_sb_with_band0(mapping.strip_blk, band0), *inputs)

  return gout
