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

* Sequential alpha compositing over a chunk is vectorised in closed form:
  the exclusive transmittance product becomes ``exp(L @ log1p(-alpha))``
  with a lower-triangular matmul on the MXU, and the feature accumulation
  is a ``(G,F) x (G,PIX)`` contraction — also MXU.  The depth axis lives on
  sublanes, the ``tile_area`` pixels on lanes.

* Saturation is a transmittance **freeze** (``T <= 1 - saturate_threshold``
  masks all later contributions), giving a closed-form forward that is
  exactly consistent with the backward — the reference's backward applies
  this stop (backward.py:154-160) while its forward does not.

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
  Hillis-Steele scan — O(G log G) VPU work instead of the O(G^2) MXU
  triangular matmul (which dominated the kernel at f32-highest precision)."""
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


def _mm(a, b):
  """f32-accumulated matmul (MXU)."""
  return jax.lax.dot_general(
      a, b, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=a.dtype,
      precision=jax.lax.Precision.HIGHEST)


def _pixel_coords(t, tile_size: int, tiles_wide: int, pix: int, dtype):
  """Pixel-centre coordinates of tile ``t`` as (1, PIX) arrays."""
  tile_x = t % tiles_wide
  tile_y = t // tiles_wide
  p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
  px = (tile_x * tile_size + p % tile_size).astype(dtype) + 0.5
  py = (tile_y * tile_size + p // tile_size).astype(dtype) + 0.5
  return px, py


def _pdf(px, py, pts_ref, antialias: bool):
  """Evaluate the (anti-aliased) gaussian pdf of G points at PIX pixels.

  Returns (pdf (G,PIX), residuals tuple for gradients).
  Mirrors taichi_lib/generic.py:311-317 (plain) and :347-357 (antialias).
  """
  mean_x = pts_ref[:, 0:1]
  mean_y = pts_ref[:, 1:2]
  ax = pts_ref[:, 2:3]
  ay = pts_ref[:, 3:4]
  # null padding slots are all-zero; guard sigma against 0/0 -> NaN (the
  # NaN would poison the whole chunk through the cumulative product)
  sx = jnp.maximum(pts_ref[:, 4:5], 1e-12)
  sy = jnp.maximum(pts_ref[:, 5:6], 1e-12)

  dx = px - mean_x        # (G, PIX)
  dy = py - mean_y

  # gaussian-frame coordinates: u along axis, v along perp(axis) = (-ay, ax)
  tu = dx * ax + dy * ay
  tv = -dx * ay + dy * ax

  if not antialias:
    txs = tu / sx
    tys = tv / sy
    p = jnp.exp(-0.5 * (txs * txs + tys * tys))
    return p, (dx, dy, ax, ay, sx, sy, txs, tys, p)
  else:
    def s_sig(x, s):
      z = x / s
      return 1.0 / (1.0 + jnp.exp(-1.6 * z - 0.07 * z * z * z))

    sx1, sx2 = s_sig(tu + 0.5, sx), s_sig(tu - 0.5, sx)
    sy1, sy2 = s_sig(tv + 0.5, sy), s_sig(tv - 0.5, sy)
    ix = sx * (sx1 - sx2)
    iy = sy * (sy1 - sy2)
    tau = 2.0 * jnp.pi
    p = tau * ix * iy
    return p, (dx, dy, ax, ay, sx, sy, tu, tv, sx1, sx2, sy1, sy2, ix, iy)


def _pdf_grads(res, antialias: bool):
  """Hand-derived pdf gradients (generic.py:321-336 and :371-404).

  Returns (dp_dmean_x, dp_dmean_y, dp_daxis_x, dp_daxis_y,
           dp_dsigma_x, dp_dsigma_y), each (G, PIX).
  """
  if not antialias:
    dx, dy, ax, ay, sx, sy, txs, tys, p = res
    # tx_s = tx / sigma.x (a second division — generic.py:331)
    txss = txs / sx
    tyss = tys / sy
    # dp/dmean = p * (tx_s * axis + ty_s * perp(axis))
    dmx = p * (txss * ax - tyss * ay)
    dmy = p * (txss * ay + tyss * ax)
    # dp/daxis = p * (tx_s * -d + ty_s * perp(d));  perp(d) = (-dy, dx)
    dax = p * (-txss * dx - tyss * dy)
    day = p * (-txss * dy + tyss * dx)
    # dp/dsigma = (tx^2, ty^2) * p / sigma
    dsx = p * txs * txs / sx
    dsy = p * tys * tys / sy
    return dmx, dmy, dax, day, dsx, dsy
  else:
    (dx, dy, ax, ay, sx, sy, tu, tv, sx1, sx2, sy1, sy2, ix, iy) = res
    tau = 2.0 * jnp.pi

    def s_grads(s_val, x, sig):
      # s already computed; ds/dx and ds/dsigma (generic.py:360-368)
      z = x / sig
      ds_dx = (1.6 + 0.21 * z * z) * s_val * (1.0 - s_val)
      d_dx = ds_dx / sig
      return d_dx, d_dx * -z

    dx1, dx1s = s_grads(sx1, tu + 0.5, sx)
    dx2, dx2s = s_grads(sx2, tu - 0.5, sx)
    dy1, dy1s = s_grads(sy1, tv + 0.5, sy)
    dy2, dy2s = s_grads(sy2, tv - 0.5, sy)

    dsx_t = iy * sx * (dx1 - dx2)   # d i2d / d tu  (scaled)
    dsy_t = ix * sy * (dy1 - dy2)   # d i2d / d tv

    # di/dmean = tau * (dSx * -axis + dSy * -perp(axis)); perp(a) = (-ay, ax)
    dmx = tau * (-dsx_t * ax + dsy_t * ay)
    dmy = tau * (-dsx_t * ay - dsy_t * ax)
    # di/daxis = tau * (dSx * d + dSy * -perp(d)); perp(d) = (-dy, dx)
    dax = tau * (dsx_t * dx + dsy_t * dy)
    day = tau * (dsx_t * dy - dsy_t * dx)
    # di/dsigma
    dsx = tau * iy * (sx1 - sx2 + (dx1s - dx2s) * sx)
    dsy = tau * ix * (sy1 - sy2 + (dy1s - dy2s) * sy)
    return dmx, dmy, dax, day, dsx, dsy


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

  @pl.when(jnp.logical_not(is_dummy))
  def _():
    px, py = _pixel_coords(t, config.tile_size, tiles_wide, pix, dtype)
    p, _ = _pdf(px, py, pts_ref, config.antialias)

    point_alpha = pts_ref[:, 6:7]
    a = point_alpha * p
    a = jnp.minimum(a, config.clamp_max_alpha)
    a = jnp.where(a > config.alpha_threshold, a, 0.0)     # (G, PIX)

    t_in = jnp.where(is_first, jnp.ones((1, pix), dtype), t_run_ref[...])

    one_minus = 1.0 - a
    e_excl = _cumprod_excl(one_minus)                     # prod_{j<i}(1-a_j)
    t_i = t_in * e_excl                                   # exclusive T
    t_end = t_in * (e_excl[g - 1:g, :] * one_minus[g - 1:g, :])

    feats = feat_ref[...]                                 # (G, F_total)

    if config.use_alpha_blending:
      cut = 1.0 - config.saturate_threshold
      mask = (t_i > cut).astype(dtype)
      w = a * t_i * mask                                  # (G, PIX)
      contrib = _mm(feats, w)                             # (F_total, PIX)
      # frozen transmittance carry (first crossing, closed form)
      frozen = jnp.maximum(
          t_end, jnp.max(jnp.where(t_i <= cut, t_i, 0.0), 0, keepdims=True))
      t_new = frozen
    else:
      # quantile mode (forward.py:105-112): select the feature of the first
      # point where cumulative weight crosses 1 - saturate_threshold
      t_incl = t_i * (1.0 - a)
      sel = ((t_incl <= config.saturate_threshold)
             & (t_i > config.saturate_threshold)).astype(dtype)
      w = a * t_i                                         # unfrozen weights
      contrib = _mm(feats, sel)
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

  @pl.when(is_dummy)
  def _():
    vis_ref[...] = jnp.zeros(vis_ref.shape, vis_ref.dtype)


def forward(points_chunked: jnp.ndarray,     # (A, 8)
            features_chunked: jnp.ndarray,   # (A, F+1) last channel unused
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

  k = pl.program_id(0)
  t = ct_ref[k]
  prev_t = ct_ref[jnp.maximum(k - 1, 0)]
  is_first = jnp.logical_or(k == 0, t != prev_t)
  is_dummy = t >= num_tiles

  @pl.when(is_dummy)
  def _():
    gpts_ref[...] = jnp.zeros(gpts_ref.shape, gpts_ref.dtype)
    gfeat_ref[...] = jnp.zeros(gfeat_ref.shape, gfeat_ref.dtype)
    heur_ref[...] = jnp.zeros(heur_ref.shape, heur_ref.dtype)

  @pl.when(jnp.logical_not(is_dummy))
  def _():
    px, py = _pixel_coords(t, config.tile_size, tiles_wide, pix, dtype)
    p, res = _pdf(px, py, pts_ref, config.antialias)

    point_alpha = pts_ref[:, 6:7]
    a_raw = point_alpha * p
    clamp_live = (a_raw < config.clamp_max_alpha).astype(dtype)
    a = jnp.minimum(a_raw, config.clamp_max_alpha)
    thresh = (a > config.alpha_threshold).astype(dtype)
    a = jnp.where(a > config.alpha_threshold, a, 0.0)

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

    cut = 1.0 - config.saturate_threshold
    mask = (t_i > cut).astype(dtype) * thresh
    w = a * t_i * mask

    feats = feat_ref[...]                                 # (G, F_total)
    gf = jax.lax.dot_general(                             # (G, PIX)
        feats, gimg, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST)

    wgf = w * gf
    # s_i = sum_c g * remaining_i  (inclusive: current point subtracted)
    s_i = s_in - _cumsum_incl(wgf)

    alpha_grad = (t_i * gf - s_i / (1.0 - a)) * mask      # (G, PIX)

    # gradient w.r.t. the packed gaussian (backward.py:180-194)
    aag = point_alpha * alpha_grad                        # alpha_alpha_grad
    aag_pdf = aag * clamp_live                            # through the clamp

    dmx, dmy, dax, day, dsx, dsy = _pdf_grads(res, config.antialias)

    def rsum(x):
      return jnp.sum(x, 1, keepdims=True)                 # (G, 1)

    gpts_ref[:, 0:1] = rsum(aag_pdf * dmx)
    gpts_ref[:, 1:2] = rsum(aag_pdf * dmy)
    gpts_ref[:, 2:3] = rsum(aag_pdf * dax)
    gpts_ref[:, 3:4] = rsum(aag_pdf * day)
    gpts_ref[:, 4:5] = rsum(aag_pdf * dsx)
    gpts_ref[:, 5:6] = rsum(aag_pdf * dsy)
    gpts_ref[:, 6:7] = rsum(p * alpha_grad * mask * clamp_live)
    gpts_ref[:, 7:8] = jnp.zeros((g, 1), dtype)

    # feature gradient: sum_px w * g  (backward.py:196-197)
    gfeat_ref[...] = jax.lax.dot_general(
        w, gimg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST)              # (G, F_total)

    if config.compute_point_heuristic:
      # prune cost: sum_px (point_alpha * alpha_grad)^2; split score:
      # sum_px |pos_grad| (backward.py:190-194)
      heur_ref[:, 0:1] = rsum((aag * mask) ** 2)
      heur_ref[:, 1:2] = rsum(jnp.abs(aag_pdf * dmx) + jnp.abs(aag_pdf * dmy))
    else:
      heur_ref[...] = jnp.zeros(heur_ref.shape, heur_ref.dtype)

    frozen = jnp.maximum(
        t_end, jnp.max(jnp.where(t_i <= cut, t_i, 0.0), 0, keepdims=True))
    t_run_ref[...] = frozen
    s_run_ref[...] = s_i[g - 1:g, :]


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
