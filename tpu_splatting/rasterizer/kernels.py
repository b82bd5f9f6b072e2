"""Pallas TPU kernels for tile-based alpha-compositing rasterization.

TPU-native re-design of the reference CUDA rasterizer
(/root/reference/taichi_splatting/rasterizer/forward.py:22-137 and
backward.py:50-227).  The reference launches one thread block per tile with
shared-memory staging and warp-reduced atomics; neither shared-memory
cooperation nor cheap global atomics exist on TPU, so the computation is
re-architected as a **pipelined scan over fixed-size overlap chunks**
(flash-attention style):

* The tile mapper lays overlaps out chunk-aligned: every chunk of
  ``G = chunk_size`` overlap slots belongs to exactly one tile, chunks of a
  tile are consecutive, and null slots have alpha 0 (compositing no-ops).

* The Pallas grid iterates chunks.  Block index maps are driven by
  scalar-prefetched ``chunk_to_tile`` / ``chunk_src`` arrays, so input
  blocks stream linearly from HBM (auto double-buffered) and each output
  image block stays resident in VMEM while its tile's chunks are processed
  (revisiting semantics).  Per-tile transmittance state lives in VMEM
  scratch, re-initialised at tile boundaries.

* **The MXU does the heavy lifting** (a v5e has ~20x more MXU than VPU
  throughput): the gaussian-frame coordinates of all G points at all
  tile pixels are linear forms evaluated as ``(G,4) @ (4,PIX)`` matmuls in
  tile-local coordinates; feature compositing is a ``(G,F) x (G,PIX)``
  contraction; and every per-point gradient reduction in the backward is
  factored through pixel moments ``(G,PIX) @ (PIX,3)`` instead of
  elementwise (G,PIX) chains.

* Sequential alpha compositing over a chunk is vectorised in closed form:
  the exclusive transmittance product is a log-depth Hillis-Steele scan.
  Saturation is a transmittance **freeze** (``T <= 1 - saturate_threshold``
  masks all later contributions), giving a closed-form forward that is
  exactly consistent with the backward — the reference's backward applies
  this stop (backward.py:154-160) while its forward does not.  Fully
  saturated tiles skip the remaining chunks' compute entirely (exact: the
  freeze mask already zeroes them).

* The backward re-derives per-point gradients with the reference's
  "remaining feature" trick (backward.py:166-196) in scan form: a running
  ``s = sum_c g * remaining`` scalar per pixel replaces the per-pixel
  remaining-feature vectors, so no (G, PIX, F) tensor is ever materialised.
  Per-overlap gradients are written contiguously (no atomics) and
  segment-summed to points outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data_types import RasterConfig


def use_interpret() -> bool:
  """Pallas interpret mode on CPU (tests / f64 gradcheck)."""
  return jax.default_backend() == "cpu"


def _shift_down(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
  """Shift rows down by ``s`` along the sublane axis, filling with ``fill``."""
  pad = jnp.full((s, x.shape[1]), fill, x.dtype)
  return jnp.concatenate([pad, x[:-s]], 0)


def _cumprod_excl(x: jnp.ndarray) -> jnp.ndarray:
  """Exclusive cumulative product along axis 0 (depth), log-depth
  Hillis-Steele scan — O(G log G) VPU work."""
  g = x.shape[0]
  y = _shift_down(x, 1, 1.0)
  s = 1
  while s < g:
    y = y * _shift_down(y, s, 1.0)
    s *= 2
  return y


def _cumsum_incl(x: jnp.ndarray) -> jnp.ndarray:
  """Inclusive cumulative sum along axis 0 (Hillis-Steele)."""
  g = x.shape[0]
  y = x
  s = 1
  while s < g:
    y = y + _shift_down(y, s, 0.0)
    s *= 2
  return y


def _mm(a, b, contract=((1,), (0,))):
  return jax.lax.dot_general(
      a, b, dimension_numbers=(contract, ((), ())),
      preferred_element_type=a.dtype,
      precision=jax.lax.Precision.HIGHEST)


def _pixel_basis(pix: int, tile_size: int, dtype):
  """Tile-local pixel-centre basis rows.

  Returns (pxl (1,PIX), pyl (1,PIX), basis4 (4,PIX) rows [pxl, pyl, 1, 0],
  basis3 (3,PIX) rows [pxl, pyl, 1]).  Local coordinates keep the linear
  forms numerically tight (global pixel coords would cancel catastrophically
  in f32).
  """
  p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
  pxl = (p % tile_size).astype(dtype) + 0.5
  pyl = (p // tile_size).astype(dtype) + 0.5
  one = jnp.ones((1, pix), dtype)
  zero = jnp.zeros((1, pix), dtype)
  basis4 = jnp.concatenate([pxl, pyl, one, zero], 0)
  basis3 = jnp.concatenate([pxl, pyl, one], 0)
  return pxl, pyl, basis4, basis3


def _point_coeffs(pts_ref, t, tile_size: int, tiles_wide: int, dtype):
  """Per-point linear-form coefficients in tile-local coordinates.

  u = (d . axis) / sx and v = (d . perp(axis)) / sy (generic.py:311-317)
  become u = lu @ [pxl, pyl, 1, 0], v = lv @ [...] with the tile origin
  folded into the mean.  Returns per-point (G,1) columns and the (G,4)
  coefficient matrices.
  """
  ox = ((t % tiles_wide) * tile_size).astype(dtype)
  oy = ((t // tiles_wide) * tile_size).astype(dtype)

  mlx = pts_ref[:, 0:1] - ox          # mean in tile-local coords
  mly = pts_ref[:, 1:2] - oy
  ax = pts_ref[:, 2:3]
  ay = pts_ref[:, 3:4]
  # null padding slots are all-zero; guard sigma against 0/0 -> NaN
  isx = 1.0 / jnp.maximum(pts_ref[:, 4:5], 1e-12)
  isy = 1.0 / jnp.maximum(pts_ref[:, 5:6], 1e-12)
  point_alpha = pts_ref[:, 6:7]

  zeros = jnp.zeros_like(ax)
  lu = jnp.concatenate(
      [ax * isx, ay * isx, -(mlx * ax + mly * ay) * isx, zeros], -1)
  lv = jnp.concatenate(
      [-ay * isy, ax * isy, (mlx * ay - mly * ax) * isy, zeros], -1)
  return mlx, mly, ax, ay, isx, isy, point_alpha, lu, lv


def _alphas(lu, lv, basis4, point_alpha, config, antialias_sigma=None):
  """u, v via MXU; pdf + clamped/thresholded alpha (forward.py:97-101)."""
  u = _mm(lu, basis4)                  # (G, PIX)
  v = _mm(lv, basis4)
  if antialias_sigma is None:
    p = jnp.exp(-0.5 * (u * u + v * v))
  else:
    sx, sy = antialias_sigma           # (G,1) each; u,v are *unscaled* here
    p = _antialias_pdf(u, v, sx, sy)
  a = jnp.minimum(point_alpha * p, config.clamp_max_alpha)
  a = jnp.where(a > config.alpha_threshold, a, 0.0)
  return u, v, p, a


def _s_sig(x, s):
  z = x / s
  return 1.0 / (1.0 + jnp.exp(-1.6 * z - 0.07 * z * z * z))


def _antialias_pdf(tu, tv, sx, sy):
  """Pixel-integrated pdf (generic.py:347-357); tu/tv unscaled frame coords."""
  ix = sx * (_s_sig(tu + 0.5, sx) - _s_sig(tu - 0.5, sx))
  iy = sy * (_s_sig(tv + 0.5, sy) - _s_sig(tv - 0.5, sy))
  return 2.0 * jnp.pi * ix * iy


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _forward_kernel(ct_ref, cs_ref, pts_ref, feat_ref,
                    img_ref, vis_ref, t_run_ref,
                    *, config: RasterConfig, num_tiles: int, tiles_wide: int,
                    f_total: int):
  g = config.chunk_size
  pix = config.tile_area
  dtype = img_ref.dtype

  k = pl.program_id(0)
  t = ct_ref[k]
  prev_t = ct_ref[jnp.maximum(k - 1, 0)]
  is_first = jnp.logical_or(k == 0, t != prev_t)
  is_dummy = t >= num_tiles

  # exact chunk skip: once a tile's transmittance is everywhere below the
  # freeze cut, later chunks contribute exactly zero (blending mode)
  if config.use_alpha_blending:
    cut = 1.0 - config.saturate_threshold
    saturated = jnp.logical_and(jnp.logical_not(is_first),
                                jnp.max(t_run_ref[...]) <= cut)
  else:
    saturated = False
  active = jnp.logical_not(jnp.logical_or(is_dummy, saturated))

  @pl.when(active)
  def _():
    _, _, basis4, _ = _pixel_basis(pix, config.tile_size, dtype)
    (mlx, mly, ax, ay, isx, isy, point_alpha, lu,
     lv) = _point_coeffs(pts_ref, t, config.tile_size, tiles_wide, dtype)

    if config.antialias:
      # antialias uses unscaled frame coords: strip the 1/sigma factors
      sx = pts_ref[:, 4:5]
      sy = pts_ref[:, 5:6]
      lu_r = lu * sx
      lv_r = lv * sy
      _, _, p, a = _alphas(lu_r, lv_r, basis4, point_alpha, config,
                           antialias_sigma=(sx, sy))
    else:
      _, _, p, a = _alphas(lu, lv, basis4, point_alpha, config)

    t_in = jnp.where(is_first, jnp.ones((1, pix), dtype), t_run_ref[...])

    one_minus = 1.0 - a
    e_excl = _cumprod_excl(one_minus)                     # prod_{j<i}(1-a_j)
    t_i = t_in * e_excl                                   # exclusive T
    t_end = t_in * (e_excl[g - 1:g, :] * one_minus[g - 1:g, :])

    feats = feat_ref[...]                                 # (G, F_total)

    if config.use_alpha_blending:
      cut_b = 1.0 - config.saturate_threshold
      mask = (t_i > cut_b).astype(dtype)
      w = a * t_i * mask                                  # (G, PIX)
      contrib = _mm(feats, w, contract=((0,), (0,)))      # (F_total, PIX)
      # frozen transmittance carry (first crossing, closed form)
      t_new = jnp.maximum(
          t_end, jnp.max(jnp.where(t_i <= cut_b, t_i, 0.0), 0, keepdims=True))
    else:
      # quantile mode (forward.py:105-112): select the feature of the first
      # point where cumulative weight crosses 1 - saturate_threshold
      t_incl = t_i * one_minus
      sel = ((t_incl <= config.saturate_threshold)
             & (t_i > config.saturate_threshold)).astype(dtype)
      w = a * t_i                                         # unfrozen weights
      contrib = _mm(feats, sel, contract=((0,), (0,)))
      t_new = t_end

    @pl.when(is_first)
    def _():
      img_ref[0] = contrib

    @pl.when(jnp.logical_not(is_first))
    def _():
      img_ref[0] += contrib

    if not config.use_alpha_blending:
      # alpha channel in quantile mode: hit mask (forward.py:135)
      img_ref[0, f_total - 1:f_total, :] = (t_new < 1.0).astype(dtype)

    vis_ref[...] = jnp.sum(w, 1, keepdims=True)           # (G, 1)
    t_run_ref[...] = t_new

  @pl.when(jnp.logical_not(active))
  def _():
    vis_ref[...] = jnp.zeros(vis_ref.shape, vis_ref.dtype)


def forward(points_chunked: jnp.ndarray,     # (A, 8)
            features_chunked: jnp.ndarray,   # (A, F+1) last channel = 1
            chunk_to_tile: jnp.ndarray,      # (K,)
            chunk_src: jnp.ndarray,          # (K,)
            config: RasterConfig, num_tiles: int, tiles_wide: int,
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Rasterize chunked overlaps.

  Returns:
    image_tiled: (num_tiles + 1, F+1, tile_area); channel F is alpha, the
      last tile row is the dummy slot.
    vis_chunked: (A, 1) per-overlap blend weight sums.
  """
  a_cap, f_total = features_chunked.shape
  g = config.chunk_size
  pix = config.tile_area
  k_chunks = chunk_to_tile.shape[0]
  dtype = points_chunked.dtype

  kernel = functools.partial(
      _forward_kernel, config=config, num_tiles=num_tiles,
      tiles_wide=tiles_wide, f_total=f_total)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k_chunks,),
      in_specs=[
          pl.BlockSpec((g, 8), lambda k, ct, cs: (cs[k], 0)),
          pl.BlockSpec((g, f_total), lambda k, ct, cs: (cs[k], 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, f_total, pix), lambda k, ct, cs: (ct[k], 0, 0)),
          pl.BlockSpec((g, 1), lambda k, ct, cs: (k, 0)),
      ],
      scratch_shapes=[pltpu.VMEM((1, pix), dtype)],
  )

  image_tiled, vis_chunked = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((num_tiles + 1, f_total, pix), dtype),
          jax.ShapeDtypeStruct((a_cap, 1), dtype),
      ],
      interpret=use_interpret(),
  )(chunk_to_tile, chunk_src, points_chunked, features_chunked)

  return image_tiled, vis_chunked


# ---------------------------------------------------------------------------
# Backward kernel (alpha-blending mode)
# ---------------------------------------------------------------------------


def _backward_kernel(ct_ref, cs_ref, pts_ref, feat_ref, img_ref, gimg_ref,
                     gpts_ref, gfeat_ref, heur_ref,
                     t_run_ref, s_run_ref,
                     *, config: RasterConfig, num_tiles: int, tiles_wide: int,
                     f_total: int):
  g = config.chunk_size
  pix = config.tile_area
  dtype = gpts_ref.dtype
  cut = 1.0 - config.saturate_threshold

  k = pl.program_id(0)
  t = ct_ref[k]
  prev_t = ct_ref[jnp.maximum(k - 1, 0)]
  is_first = jnp.logical_or(k == 0, t != prev_t)
  is_dummy = t >= num_tiles
  saturated = jnp.logical_and(jnp.logical_not(is_first),
                              jnp.max(t_run_ref[...]) <= cut)
  active = jnp.logical_not(jnp.logical_or(is_dummy, saturated))

  @pl.when(jnp.logical_not(active))
  def _():
    gpts_ref[...] = jnp.zeros(gpts_ref.shape, gpts_ref.dtype)
    gfeat_ref[...] = jnp.zeros(gfeat_ref.shape, gfeat_ref.dtype)
    heur_ref[...] = jnp.zeros(heur_ref.shape, heur_ref.dtype)

  @pl.when(active)
  def _():
    pxl, pyl, basis4, basis3 = _pixel_basis(pix, config.tile_size, dtype)
    (mlx, mly, ax, ay, isx, isy, point_alpha, lu,
     lv) = _point_coeffs(pts_ref, t, config.tile_size, tiles_wide, dtype)

    antialias = config.antialias
    if antialias:
      sx = pts_ref[:, 4:5]
      sy = pts_ref[:, 5:6]
      lu_r = lu * sx
      lv_r = lv * sy
      tu, tv, p, a = _alphas(lu_r, lv_r, basis4, point_alpha, config,
                             antialias_sigma=(sx, sy))
    else:
      u, v, p, a = _alphas(lu, lv, basis4, point_alpha, config)

    clamp_live = (point_alpha * p < config.clamp_max_alpha).astype(dtype)
    thresh = (a > 0.0).astype(dtype)

    gimg = gimg_ref[0]                                    # (F_total, PIX)
    img = img_ref[0]

    t_in = jnp.where(is_first, jnp.ones((1, pix), dtype), t_run_ref[...])
    s_in = jnp.where(is_first, jnp.sum(gimg * img, 0, keepdims=True),
                     s_run_ref[...])

    # replay the forward compositing
    one_minus = 1.0 - a
    e_excl = _cumprod_excl(one_minus)
    t_i = t_in * e_excl
    t_end = t_in * (e_excl[g - 1:g, :] * one_minus[g - 1:g, :])

    mask = (t_i > cut).astype(dtype) * thresh
    w = a * t_i * mask

    feats = feat_ref[...]                                 # (G, F_total)
    gf = _mm(feats, gimg)                                 # (G, PIX)

    wgf = w * gf
    # s_i = sum_c g * remaining_i  (inclusive: current point subtracted)
    s_i = s_in - _cumsum_incl(wgf)

    alpha_grad = (t_i * gf - s_i / one_minus) * mask      # (G, PIX)

    # gradient w.r.t. the packed gaussian (backward.py:180-194), factored
    # through pixel moments so the reductions ride the MXU:
    #   z0 = aag * p,  zu = z0 * u,  zv = z0 * v
    #   each needs (sum, sum*pxl, sum*pyl) -> (G,3) = Z @ basis3^T
    aag = point_alpha * alpha_grad * clamp_live           # -> pdf p
    z0 = aag * p
    if antialias:
      # antialias gradients don't factor through u/v moments; use the
      # closed forms (generic.py:371-404) with explicit (G,PIX) chains
      dmx, dmy, dax, day, dsx, dsy = _antialias_grads(
          tu, tv, sx, sy, pxl - mlx, pyl - mly, ax, ay)
      gpts_ref[:, 0:1] = jnp.sum(aag * dmx, 1, keepdims=True)
      gpts_ref[:, 1:2] = jnp.sum(aag * dmy, 1, keepdims=True)
      gpts_ref[:, 2:3] = jnp.sum(aag * dax, 1, keepdims=True)
      gpts_ref[:, 3:4] = jnp.sum(aag * day, 1, keepdims=True)
      gpts_ref[:, 4:5] = jnp.sum(aag * dsx, 1, keepdims=True)
      gpts_ref[:, 5:6] = jnp.sum(aag * dsy, 1, keepdims=True)
      split_px = jnp.abs(aag * dmx) + jnp.abs(aag * dmy)
    else:
      zu = z0 * u
      zv = z0 * v
      mu = _mm(zu, basis3, contract=((1,), (1,)))         # (G,3): [Spx,Spy,S]
      mv = _mm(zv, basis3, contract=((1,), (1,)))

      su, su_px, su_py = mu[:, 2:3], mu[:, 0:1], mu[:, 1:2]
      sv, sv_px, sv_py = mv[:, 2:3], mv[:, 0:1], mv[:, 1:2]

      # dp/dmean = p(u isx ax - v isy ay, u isx ay + v isy ax)
      gpts_ref[:, 0:1] = ax * isx * su - ay * isy * sv
      gpts_ref[:, 1:2] = ay * isx * su + ax * isy * sv
      # dp/daxis = p(-u isx dx - v isy dy, -u isx dy + v isy dx),
      # with sum(z*dx) = sum(z*pxl) - mlx*sum(z)
      su_dx = su_px - mlx * su
      su_dy = su_py - mly * su
      sv_dx = sv_px - mlx * sv
      sv_dy = sv_py - mly * sv
      gpts_ref[:, 2:3] = -isx * su_dx - isy * sv_dy
      gpts_ref[:, 3:4] = -isx * su_dy + isy * sv_dx
      # dp/dsigma = p u^2 isx : sum(zu*u) via u's linear form
      suu = lu[:, 0:1] * su_px + lu[:, 1:2] * su_py + lu[:, 2:3] * su
      svv = lv[:, 0:1] * sv_px + lv[:, 1:2] * sv_py + lv[:, 2:3] * sv
      gpts_ref[:, 4:5] = isx * suu
      gpts_ref[:, 5:6] = isy * svv

      if config.compute_point_heuristic:
        dmx = p * (u * (isx * ax) - v * (isy * ay))
        dmy = p * (u * (isx * ay) + v * (isy * ax))
        split_px = jnp.abs(aag * dmx) + jnp.abs(aag * dmy)

    # grad w.r.t. point alpha: sum p * alpha_grad * mask * clamp
    gpts_ref[:, 6:7] = jnp.sum(z0, 1, keepdims=True) / jnp.maximum(
        point_alpha, 1e-20)
    gpts_ref[:, 7:8] = jnp.zeros((g, 1), dtype)

    # feature gradient: sum_px w * g  (backward.py:196-197)
    gfeat_ref[...] = _mm(w, gimg, contract=((1,), (1,)))  # (G, F_total)

    if config.compute_point_heuristic:
      aag_h = point_alpha * alpha_grad                    # reference form
      heur_ref[:, 0:1] = jnp.sum(aag_h * aag_h, 1, keepdims=True)
      heur_ref[:, 1:2] = jnp.sum(split_px, 1, keepdims=True)
    else:
      heur_ref[...] = jnp.zeros(heur_ref.shape, heur_ref.dtype)

    t_new = jnp.maximum(
        t_end, jnp.max(jnp.where(t_i <= cut, t_i, 0.0), 0, keepdims=True))
    t_run_ref[...] = t_new
    s_run_ref[...] = s_i[g - 1:g, :]


def _antialias_grads(tu, tv, sx, sy, dx, dy, ax, ay):
  """Anti-aliased pdf gradients (generic.py:371-404); all (G,PIX)."""
  tau = 2.0 * jnp.pi

  def s_grads(x, sig):
    z = x / sig
    s_val = 1.0 / (1.0 + jnp.exp(-1.6 * z - 0.07 * z * z * z))
    ds_dx = (1.6 + 0.21 * z * z) * s_val * (1.0 - s_val)
    d_dx = ds_dx / sig
    return s_val, d_dx, d_dx * -z

  sx1, dx1, dx1s = s_grads(tu + 0.5, sx)
  sx2, dx2, dx2s = s_grads(tu - 0.5, sx)
  sy1, dy1, dy1s = s_grads(tv + 0.5, sy)
  sy2, dy2, dy2s = s_grads(tv - 0.5, sy)

  ix = sx * (sx1 - sx2)
  iy = sy * (sy1 - sy2)

  dsx_t = iy * sx * (dx1 - dx2)
  dsy_t = ix * sy * (dy1 - dy2)

  dmx = tau * (-dsx_t * ax + dsy_t * ay)
  dmy = tau * (-dsx_t * ay - dsy_t * ax)
  dax = tau * (dsx_t * dx + dsy_t * dy)
  day = tau * (dsx_t * dy - dsy_t * dx)
  dsx_ = tau * iy * (sx1 - sx2 + (dx1s - dx2s) * sx)
  dsy_ = tau * ix * (sy1 - sy2 + (dy1s - dy2s) * sy)
  return dmx, dmy, dax, day, dsx_, dsy_


def backward(points_chunked: jnp.ndarray, features_chunked: jnp.ndarray,
             image_tiled: jnp.ndarray, g_image_tiled: jnp.ndarray,
             chunk_to_tile: jnp.ndarray, chunk_src: jnp.ndarray,
             config: RasterConfig, num_tiles: int, tiles_wide: int):
  """Backward pass: per-overlap gradients (to be segment-summed by caller).

  Returns (grad_points_chunked (A, 8), grad_features_chunked (A, F+1),
           heuristics_chunked (A, 2)).
  """
  a_cap, f_total = features_chunked.shape
  g = config.chunk_size
  pix = config.tile_area
  k_chunks = chunk_to_tile.shape[0]
  dtype = points_chunked.dtype

  kernel = functools.partial(
      _backward_kernel, config=config, num_tiles=num_tiles,
      tiles_wide=tiles_wide, f_total=f_total)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k_chunks,),
      in_specs=[
          pl.BlockSpec((g, 8), lambda k, ct, cs: (cs[k], 0)),
          pl.BlockSpec((g, f_total), lambda k, ct, cs: (cs[k], 0)),
          pl.BlockSpec((1, f_total, pix), lambda k, ct, cs: (ct[k], 0, 0)),
          pl.BlockSpec((1, f_total, pix), lambda k, ct, cs: (ct[k], 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((g, 8), lambda k, ct, cs: (k, 0)),
          pl.BlockSpec((g, f_total), lambda k, ct, cs: (k, 0)),
          pl.BlockSpec((g, 2), lambda k, ct, cs: (k, 0)),
      ],
      scratch_shapes=[pltpu.VMEM((1, pix), dtype),
                      pltpu.VMEM((1, pix), dtype)],
  )

  return pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((a_cap, 8), dtype),
          jax.ShapeDtypeStruct((a_cap, f_total), dtype),
          jax.ShapeDtypeStruct((a_cap, 2), dtype),
      ],
      interpret=use_interpret(),
  )(chunk_to_tile, chunk_src, points_chunked, features_chunked,
    image_tiled, g_image_tiled)
