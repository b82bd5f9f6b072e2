"""Differentiable rasterization over the tile-stream pipeline.

``stream_rasterize_with_mapping`` is the drop-in equivalent of
``rasterize_with_tiles`` (function.py) for the stream mapping: a
custom_vjp whose forward is ONE grouped Pallas kernel over the
home-sorted table and whose backward reduces per-class gradient slabs
with a single (N,)-row gather + one N-sized sort back to the caller's
point order — the overlap-domain sorts and the segment-sum of the sorted
pipeline do not exist here (see stream.py for the design rationale).

Full feature scope (v2): alpha blending AND quantile/median mode,
antialias, visibility + point heuristics.  Because per-point outputs
require the backward's slab reduction, visibility/heuristics surface as
the COTANGENT of a zero-valued probe input (same contract as the sorted
pipeline's ``heuristic_probe``, function.py:23-29, extended with a
leading visibility column): computing them costs one backward pass, which
every training step runs anyway.  Quantile mode is forward-only, exactly
like the sorted pipeline (the reference's no-blending backward is
untested/wrong — see function.py:31-36).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data_types import RasterConfig
from .stream import STRIP_SLACK, StreamMapping, stream_map
from .stream_kernels import slab_width, stream_backward, stream_forward


def _float0(x):
  """Zero cotangent for a non-differentiated mapping leaf: real zeros for
  float leaves (float0 would poison an upstream stream_map vjp when the
  caller differentiates through the map build, e.g. gradcheck probes),
  float0 for integer leaves (the only valid zero there)."""
  if np.issubdtype(np.dtype(x.dtype), np.floating):
    return jnp.zeros(x.shape, x.dtype)
  return np.zeros(x.shape, jax.dtypes.float0)


def stream_reduce(gout: jnp.ndarray, mapping: StreamMapping,
                  run_cap: int, slabw: int):
  """Reduce the per-group gradient slab blocks to per-point gradient
  COLUMNS in the caller's point order: Pallas 9-slab merge + per-column
  gathers.  Returns ``slabw`` 1D (n,) columns — everything stays
  column-wise: a (n, slabw) intermediate tile-pads ~10x in HBM and its
  per-column slice reads don't fuse (each reads full (8,128) tiles)."""
  n = mapping.num_points
  t_total = mapping.num_tiles
  r_rows = t_total * run_cap

  # --- canonicalise + sum the 9 slabs (Pallas merge kernel) -------------
  # Group-slot position j of group (gy, gx) holds home gx-1+j; slab (b,k)
  # owns positions [k, gw+k).  merge_grad_slabs sums each home's 9 class
  # cells into home-major (R,) columns reading gout exactly 3x — XLA's
  # 9*slabw lane-strided slice reads of the Pallas gout output do not
  # fuse and cost ~40x the useful bytes (measured +250 ms in-graph).
  from .stream_kernels import merge_grad_slabs
  acc_cols = merge_grad_slabs(gout, mapping, run_cap, slabw)
  return reduce_stage2(acc_cols, mapping, run_cap)


def _gout_band_bytes(mapping: StreamMapping, run_cap: int) -> int:
  """HBM bytes of ONE tile band's gradient-slab blocks (lanes pad to
  128 under the (8, 128) tiling)."""
  gw = mapping.group_width
  groups_x = mapping.tiles_wide // gw
  rows_g = (gw + 2) * run_cap + STRIP_SLACK
  return groups_x * rows_g * 128 * 4


def _pick_band_chunk(th: int, band_bytes: int, budget: int) -> int:
  """Largest band-chunk size K dividing th whose working set ((K+2)
  band-rows of slab blocks live per step) fits the budget."""
  best = 1
  for k in range(1, th + 1):
    if th % k == 0 and (k + 2) * band_bytes <= budget:
      best = k
  return best


def backward_reduce(mapping: StreamMapping, image_tiled, g_image_tiled,
                    config: RasterConfig, run_cap: int, slabw: int,
                    asm=None):
  """Backward kernel + slab merge, single-pass or band-chunked.

  The per-group slab blocks cost (gw+2)*run_cap rows x 128 lanes per
  group; long-run scenes (run_cap in the thousands) would need hundreds
  of GB for the full buffer.  When it exceeds
  ``config.stream_gout_budget_mb`` the backward runs band-chunked inside
  one ``lax.map``: each step renders K+2 tile bands' slab blocks (its K
  bands plus a recomputed one-band halo on each side — descriptors are
  zero-padded at the image edges) and merges its K bands via the merge
  kernel's halo mode, so only (K+2) band-rows of slab blocks are ever
  live.  Same halo dataflow as the multi-chip band sharding
  (parallel/stream_sharded.py), sequential instead of spatial; the halo
  recompute costs (K+2)/K of the backward kernel and zero extra copies.
  Returns per-point gradient columns in the caller's point order."""
  from .stream_kernels import merge_grad_slabs
  th = mapping.tiles_high
  band_bytes = _gout_band_bytes(mapping, run_cap)
  budget = config.stream_gout_budget_mb * (1 << 20)
  if budget <= 0 or th * band_bytes <= budget:
    gout = stream_backward(mapping, image_tiled, g_image_tiled, config,
                           run_cap, asm=asm)
    acc_cols = merge_grad_slabs(gout, mapping, run_cap, slabw)
    return reduce_stage2(acc_cols, mapping, run_cap)

  k = _pick_band_chunk(th, band_bytes, budget)
  gw = mapping.group_width
  tw = mapping.tiles_wide
  groups_x = tw // gw
  chunks = th // k
  gpc = (k + 2) * groups_x               # groups per step (with halo)
  tpc = (k + 2) * tw                     # tiles per step
  lm_src = dataclasses.replace(          # (K+2)-band backward mapping
      mapping, tiles_high=k + 2, num_tiles=tw * (k + 2))
  lm_out = dataclasses.replace(          # K-band merge mapping
      mapping, tiles_high=k, num_tiles=tw * k)

  # one zero band-row of groups/tiles on each side: the first chunk's
  # band -1 and the last chunk's band th render zero slab blocks (empty
  # descriptors), which is exactly the out-of-image merge masking
  zg = ((groups_x, groups_x),)
  zt = ((tw, tw),)
  desc_p = jnp.pad(mapping.desc, zg + ((0, 0), (0, 0)))
  sb_p = jnp.pad(mapping.strip_blk, zg + ((0, 0),))
  img_p = jnp.pad(image_tiled, zt + ((0, 0), (0, 0)))
  gimg_p = jnp.pad(g_image_tiled, zt + ((0, 0), (0, 0)))
  # halo bands' padded asm blocks are zeros: their descriptors are empty
  # (len 0), so every lane is validity-masked regardless
  asm_p = (jnp.pad(asm, zg + ((0, 0), (0, 0)))
           if asm is not None else None)

  def step(i):
    g0 = i * k * groups_x                # padded row of band i*k - 1
    t0 = i * k * tw
    d = jax.lax.dynamic_slice_in_dim(desc_p, g0, gpc, 0)
    sb = jax.lax.dynamic_slice_in_dim(sb_p, g0, gpc, 0)
    im = jax.lax.dynamic_slice_in_dim(img_p, t0, tpc, 0)
    gi = jax.lax.dynamic_slice_in_dim(gimg_p, t0, tpc, 0)
    a = (jax.lax.dynamic_slice_in_dim(asm_p, g0, gpc, 0)
         if asm_p is not None else None)
    lmc = dataclasses.replace(lm_src, desc=d, strip_blk=sb)
    gout = stream_backward(lmc, im, gi, config, run_cap,
                           band0=i * k - 1, asm=a)
    cols = merge_grad_slabs(gout, lm_out, run_cap, slabw, halo=True)
    return jnp.stack(cols)               # (slabw, k*tw*run_cap)

  ys = jax.lax.map(step, jnp.arange(chunks))
  # ys: (chunks, slabw, k*tw*rc) -> slabw home-major (T*rc,) columns
  acc = jnp.moveaxis(ys, 1, 0).reshape(slabw, th * tw * run_cap)
  return reduce_stage2([acc[c] for c in range(slabw)], mapping, run_cap)


def reduce_stage2(acc_cols, mapping: StreamMapping, run_cap: int):
  """Stage 2 of the gradient reduce: home-major (R,) columns -> caller-
  point-order (n,) columns.  Also the tail of the band-sharded path
  (parallel/stream_sharded.py) after its all_gather.

  Two implementations, chosen by the run-padding ratio (measured v5e
  costs in ns/row: XLA sort ~2.6 with payload width nearly free; ROW
  gathers ~9 regardless of width — per-ELEMENT gathers also pay ~9/elem,
  slabw times more, so the gather path first relayouts the columns into
  one (R, slabw) matrix and moves whole rows):

  * compact R: one R-sized stable compaction sort (drop run padding) +
    one N-sized pid sort carrying all columns as payload — wins when R
    is within a few x of N (uniform scenes).
  * huge R (long-run scenes, run_cap in the thousands -> R ~ 25 x N):
    one row gather over the map-time ``grad_src`` indices + one dup row
    gather/scatter-add touch n + 2 * dup_cap rows where the sorts would
    pay hundreds of ms.
  """
  n = mapping.num_points
  n_rows = n + mapping.dup_cap
  r_rows = mapping.num_tiles * run_cap
  assert mapping.grad_src.shape[0] == mapping.num_points, (
      "mapping was built with build_table=False (calibration only)")
  slabw = len(acc_cols)
  sort_cost = (r_rows + n_rows) * 2.6
  gather_cost = (r_rows * 0.1 + (n + mapping.dup_cap) * 9.0
                 + mapping.dup_cap * 14.0)
  if sort_cost <= gather_cost:
    # --- compact away run padding (stable sort by is-padding) ----------
    row = jnp.arange(r_rows, dtype=jnp.int32)
    run_lens = jnp.minimum(
        mapping.run_starts[1:] - mapping.run_starts[:-1], run_cap)
    pad_row = (row % run_cap) >= jnp.repeat(run_lens, run_cap)
    ops = (pad_row.astype(jnp.int32),) + tuple(acc_cols)
    s = jax.lax.sort(ops, num_keys=1, is_stable=True)
    m = min(n_rows, r_rows)   # valid rows always fit in the runs (<= R);
    # tiny scenes can have n + dup_cap > R — the excess table rows are
    # all sentinels (culled / unused dup slots) with zero gradient

    def to_rows(c):
      c = c[:m]
      if m < n_rows:
        c = jnp.concatenate([c, jnp.zeros((n_rows - m,), c.dtype)], 0)
      return c

    home_cols = [to_rows(c) for c in s[1:]]  # slabw x (n_rows,)
    # inverse permutation: home order -> caller's point order.  Main rows
    # carry pids 0..n-1 (each exactly once); duplicate rows carry pid + n
    # (invalid slots > 2n), so after the pid sort the first n rows ARE
    # the per-point gradients and the dup tail scatter-adds onto them.
    pid = mapping.pid_order[:n_rows]
    s2 = jax.lax.sort((pid,) + tuple(home_cols), num_keys=1)
    cols = [c[:n] for c in s2[1:]]
    if mapping.dup_cap > 0:
      dpid = jnp.clip(s2[0][n:n_rows] - n, 0, n - 1)
      dval = (s2[0][n:n_rows] - n >= 0) & (s2[0][n:n_rows] - n < n)
      cols = [c.at[dpid].add(jnp.where(dval, d[n:n_rows], 0.0))
              for c, d in zip(cols, s2[1:])]
    return cols

  # gather path: ONE (R, slabw) lane-major relayout, then ROW
  # gathers/scatters — per-column element gathers pay the ~9 ns/element
  # issue cost slabw times over (a whole row costs the same as one
  # element), so this is ~slabw x cheaper at heavy-scene sizes
  n = mapping.num_points
  slabw = len(acc_cols)
  mat = jnp.stack(acc_cols, -1)                          # (R, slabw)
  mat_ext = jnp.concatenate(
      [mat, jnp.zeros((1, slabw), mat.dtype)], 0)        # [r_rows] = 0
  v = mat_ext[mapping.grad_src]                          # (n, slabw)
  if mapping.dup_cap > 0:
    dv = mat_ext[mapping.dup_src]
    # unused dup slots carry dup_pid == N (out of bounds -> dropped)
    v = v.at[mapping.dup_pid].add(dv, mode="drop")
  return [v[:, c] for c in range(slabw)]


def detile(image_tiled: jnp.ndarray, tiles_wide: int, tiles_high: int,
           tile_size: int, image_size: Tuple[int, int]) -> jnp.ndarray:
  """(T, C, tile_area) -> (H, W, C)."""
  w_img, h_img = image_size
  c = image_tiled.shape[1]
  t = image_tiled.reshape(tiles_high, tiles_wide, c, tile_size, tile_size)
  full = t.transpose(0, 3, 1, 4, 2).reshape(
      tiles_high * tile_size, tiles_wide * tile_size, c)
  return full[:h_img, :w_img]


def entile(image: jnp.ndarray, tiles_wide: int, tiles_high: int,
           tile_size: int) -> jnp.ndarray:
  """(H, W, C) -> (T, C, tile_area), zero-padding to tile multiples."""
  h, w, c = image.shape
  ph = tiles_high * tile_size - h
  pw = tiles_wide * tile_size - w
  img = jnp.pad(image, ((0, ph), (0, pw), (0, 0)))
  t = img.reshape(tiles_high, tile_size, tiles_wide, tile_size, c)
  return t.transpose(0, 2, 4, 1, 3).reshape(
      tiles_high * tiles_wide, c, tile_size * tile_size)


def probe_width(config: RasterConfig) -> int:
  """Columns of the probe cotangent: [visibility][, prune, split]."""
  heur = config.compute_point_heuristic
  with_vis = heur or config.compute_visibility
  return (1 if with_vis else 0) + (2 if heur else 0)


def auto_group_width(tiles_wide: int, config: RasterConfig) -> int:
  """The group width the renderer uses: config override or the widest of
  (8, 4, 2, 1) dividing tiles_wide."""
  gw = config.stream_group_width
  if gw:
    assert tiles_wide % gw == 0, (tiles_wide, gw)
    return gw
  for g in (8, 4, 2, 1):
    if tiles_wide % g == 0:
      return g
  raise AssertionError


def stream_eligible(config: RasterConfig, image_size) -> bool:
  """Whether the stream pipeline can serve this render.

  Limits: 16-bit home-tile ids (65,535 tiles — beyond 16,383 the depth
  key drops to 12 bits, see stream.depth_bits_for).  ``pipeline="stream"``
  asserts instead of falling back."""
  if config.pipeline == "sorted":
    return False
  from ..mapper.tile_mapper import tile_shape
  tw, th = tile_shape(image_size, config.tile_size)
  ok = tw * th < (1 << 16)
  if config.pipeline == "stream":
    assert ok, (f"stream pipeline cannot address {tw * th} tiles "
                f"(16-bit home id); raise tile_size or use sorted")
    return True
  return ok


def stream_map_with_config(gaussians2d, depth, features, image_size,
                           config: RasterConfig) -> StreamMapping:
  """stream_map with capacities taken from the RasterConfig knobs (the
  renderer path; size them with calibrate_stream + dataclasses.replace)."""
  from ..mapper.tile_mapper import tile_shape
  tw, _ = tile_shape(image_size, config.tile_size)
  return stream_map(
      gaussians2d, depth, features, image_size, config,
      num_slabs=config.stream_num_slabs,
      strip_cap=config.stream_strip_cap,
      slab_cap=config.stream_slab_cap,
      group_width=auto_group_width(tw, config),
      w_max=config.stream_w_max,
      run_cap=config.stream_run_cap,
      wide_cap=config.stream_wide_cap,
      dup_cap=config.stream_dup_cap)


@lru_cache(maxsize=None)
def _stream_function(config: RasterConfig, run_cap: int):
  """Cached custom_vjp over the stream kernels (static config/run_cap).

  ``probe`` is a zero-valued (N, probe_width) input whose cotangent is
  defined as the per-point [visibility, prune_cost, split_score] columns
  the backward kernel computes alongside the gradients."""

  @jax.custom_vjp
  def raster(gaussians2d, features, probe, mapping):
    return stream_forward(mapping, config)

  def fwd(gaussians2d, features, probe, mapping):
    from .stream_kernels import asm_feasible
    if config.stream_share_asm and asm_feasible(mapping, config):
      image_tiled, asm = stream_forward(mapping, config, with_asm=True)
    else:
      image_tiled = stream_forward(mapping, config)
      asm = None
    return image_tiled, (image_tiled, mapping, asm)

  def bwd(residuals, g_image_tiled):
    image_tiled, mapping, asm = residuals
    f = mapping.feature_size
    slabw = slab_width(config, f)
    cols = backward_reduce(mapping, image_tiled, g_image_tiled, config,
                           run_cap, slabw, asm=asm)
    dt = cols[0].dtype
    n = mapping.num_points
    g_g2d = jnp.stack(cols[:7], -1)
    g_feats = jnp.stack(cols[7:7 + f], -1)
    pw = len(cols) - 7 - f
    g_probe = (jnp.stack(cols[7 + f:], -1) if pw
               else jnp.zeros((n, 0), dt))
    return (g_g2d, g_feats.astype(g_g2d.dtype),
            g_probe.astype(g_g2d.dtype),
            jax.tree.map(_float0, mapping))

  raster.defvjp(fwd, bwd)
  return raster


def stream_rasterize_with_mapping(
    gaussians2d: jnp.ndarray, features: jnp.ndarray,
    mapping: StreamMapping, image_size: Tuple[int, int],
    config: RasterConfig, run_cap: int = 0,
    probe: Optional[jnp.ndarray] = None, tiled: bool = False):
  """Rasterize with a precomputed stream mapping.

  Returns (image (H, W, F), image_weight (H, W)) — or the raw
  (T, F+1, PIX) tiled image when ``tiled`` (use ``entile`` on the loss
  target and ``tile_mask`` for the valid-pixel mask to keep the whole
  fwd+bwd in tile layout; ``detile`` recovers the (H, W, C) image).

  The mapping's sorted table is the data source; callers must pass the
  same arrays the mapping was built from (gradients are defined w.r.t.
  them, like the sorted pipeline's payload path).

  ``probe``: zero-valued (N, probe_width(config)) array; its gradient
  carries per-point [visibility][, prune_cost, split_score].

  Quantile mode (use_alpha_blending=False) is forward-only: outputs are
  gradient-stopped, matching the sorted pipeline (function.py:31-36).
  """
  # the mapping's descriptors (gbuf_dst, run_hi clamps) were computed with
  # mapping.run_cap inside stream_map — any other stride desynchronises the
  # backward's slab-buffer layout and silently corrupts gradients
  assert run_cap in (0, mapping.run_cap), (run_cap, mapping.run_cap)
  f = features.shape[1]

  if not config.use_alpha_blending:
    image_tiled = jax.lax.stop_gradient(stream_forward(mapping, config))
  else:
    if probe is None:
      probe = jnp.zeros((mapping.num_points, probe_width(config)),
                        gaussians2d.dtype)
    raster = _stream_function(config, mapping.run_cap)
    image_tiled = raster(gaussians2d, features, probe, mapping)

  if tiled:
    return image_tiled
  full = detile(image_tiled, mapping.tiles_wide, mapping.tiles_high,
                config.tile_size, image_size)
  return full[..., :f], full[..., f]


def tile_mask(image_size: Tuple[int, int], tiles_wide: int,
              tiles_high: int, tile_size: int) -> jnp.ndarray:
  """(T, 1, PIX) f32 mask of pixels inside the image — for computing
  losses directly in tile layout (pad pixels carry rendered content but
  must not contribute)."""
  w, h = image_size
  ones = jnp.ones((h, w, 1), jnp.float32)
  return entile(ones, tiles_wide, tiles_high, tile_size)
