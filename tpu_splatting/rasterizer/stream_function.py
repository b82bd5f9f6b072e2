"""Differentiable rasterization over the tile-stream pipeline.

``stream_rasterize`` is the drop-in equivalent of
``rasterize_with_tiles`` (function.py) for the stream mapping: a
custom_vjp whose forward is ONE grouped Pallas kernel over the
home-sorted table and whose backward reduces per-class gradient slabs
with a single (N,)-row gather + one N-sized sort back to the caller's
point order — the overlap-domain sorts and the segment-sum of the sorted
pipeline do not exist here (see stream.py for the design rationale).

v1 scope: alpha-blending mode, no antialias, no visibility/heuristic
outputs (those configs route to the sorted pipeline in function.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data_types import RasterConfig
from .stream import StreamMapping, stream_map
from .stream_kernels import stream_backward, stream_forward


def _float0(x):
  return np.zeros(x.shape, jax.dtypes.float0)


def _bitcast_u(x):
  return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bitcast_i(x):
  return jax.lax.bitcast_convert_type(x, jnp.int32)


def stream_reduce(gout: jnp.ndarray, mapping: StreamMapping,
                  run_cap: int, slabw: int) -> jnp.ndarray:
  """Reduce the RUN_CAP-strided per-class gradient slabs to per-point
  gradients in the CALLER's point order: one (N,) row gather + masked sum
  of the 9 class slabs + one N-sized inverse sort."""
  n = mapping.num_points
  tw = mapping.tiles_wide
  th = mapping.tiles_high
  t_total = mapping.num_tiles

  key = _bitcast_u(mapping.table[:n, -2])
  pid = _bitcast_i(mapping.table[:n, -1])
  h = (key >> 18).astype(jnp.int32)                 # home id; sentinel >= T
  ok = h < t_total

  # in-run offset without gathers: runs are contiguous in sorted order
  idx = jnp.arange(n, dtype=jnp.int32)
  h_prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), h[:-1]])
  run_start = jax.lax.cummax(jnp.where(h != h_prev, idx, 0))
  r = idx - run_start
  in_cap = r < run_cap

  gidx = jnp.where(ok & in_cap, h, 0) * run_cap + jnp.where(in_cap, r, 0)

  # canonicalise per-group slab blocks -> (R, 9*slabw) home-major rows.
  # Group (gy, gx) slab (b, k) position j holds home gx-1+j (its owned
  # homes are positions [k, gw+k)); concatenating owned windows group-
  # major and shifting by ((b-1)*tw + (k-1))*run_cap aligns every slab to
  # canonical home rows (ownership tiles the band exactly).
  gw = mapping.group_width
  r_rows = t_total * run_cap
  canon = []
  for b in range(3):
    for k in range(3):
      c0 = (b * 3 + k) * slabw
      sl = gout[:, k * run_cap:(k + gw) * run_cap, c0:c0 + slabw]
      sl = sl.reshape(-1, slabw)                     # (T*run_cap, S)
      shift = ((b - 1) * tw + (k - 1)) * run_cap
      if shift > 0:
        sl = jnp.concatenate(
            [jnp.zeros((shift, slabw), sl.dtype), sl[:-shift]], 0)
      elif shift < 0:
        sl = jnp.concatenate(
            [sl[-shift:], jnp.zeros((-shift, slabw), sl.dtype)], 0)
      canon.append(sl)
  flat = jnp.concatenate(canon, -1)                  # (R, 9*slabw)
  rows = flat[gidx]                                  # (N, 9*slabw) gather

  hb = h // tw
  hx = h % tw
  g_pt = jnp.zeros((n, slabw), gout.dtype)
  for b in range(3):
    tile_band = hb - b + 1
    band_ok = (tile_band >= 0) & (tile_band < th)
    for k in range(3):
      tile_x = hx + 1 - k
      valid = (ok & in_cap & band_ok
               & (tile_x >= 0) & (tile_x < tw))[:, None]
      slab = rows[:, (b * 3 + k) * slabw:(b * 3 + k + 1) * slabw]
      g_pt = g_pt + jnp.where(valid, slab, 0.0)

  # inverse permutation: home order -> caller's point order
  ops = (pid,) + tuple(g_pt[:, c] for c in range(slabw))
  s = jax.lax.sort(ops, num_keys=1)
  return jnp.stack(s[1:], -1)


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


@lru_cache(maxsize=None)
def _stream_function(config: RasterConfig, run_cap: int):
  """Cached custom_vjp over the stream kernels (static config/run_cap)."""

  @jax.custom_vjp
  def raster(gaussians2d, features, mapping):
    return stream_forward(mapping, config)

  def fwd(gaussians2d, features, mapping):
    image_tiled = stream_forward(mapping, config)
    return image_tiled, (image_tiled, mapping)

  def bwd(residuals, g_image_tiled):
    image_tiled, mapping = residuals
    f = mapping.feature_size
    slabw = 7 + f + (2 if config.compute_point_heuristic else 0)
    gout = stream_backward(mapping, image_tiled, g_image_tiled, config,
                           run_cap)
    reduced = stream_reduce(gout, mapping, run_cap, slabw)
    g_g2d = reduced[:, :7]
    g_feats = reduced[:, 7:7 + f]
    return (g_g2d, g_feats.astype(g_g2d.dtype),
            jax.tree.map(_float0, mapping))

  raster.defvjp(fwd, bwd)
  return raster


def stream_rasterize_with_mapping(
    gaussians2d: jnp.ndarray, features: jnp.ndarray,
    mapping: StreamMapping, image_size: Tuple[int, int],
    config: RasterConfig, run_cap: int):
  """Rasterize with a precomputed stream mapping.  Returns
  (image (H, W, F), image_weight (H, W)).

  The mapping's sorted table is the data source; callers must pass the
  same arrays the mapping was built from (gradients are defined w.r.t.
  them, like the sorted pipeline's payload path)."""
  assert config.use_alpha_blending and not config.antialias, (
      "stream pipeline v1 supports plain alpha blending only")
  f = features.shape[1]
  raster = _stream_function(config, run_cap)
  image_tiled = raster(gaussians2d, features, mapping)
  full = detile(image_tiled, mapping.tiles_wide, mapping.tiles_high,
                config.tile_size, image_size)
  return full[..., :f], full[..., f]
