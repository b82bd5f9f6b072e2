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
  """Reduce the per-group gradient slab blocks to per-point gradients in
  the CALLER's point order — gather-free: 9 statically-shifted slab adds,
  one R-sized compaction sort (drop run padding), one N-sized inverse
  sort back to original pids.  Every index quantity is elementwise.
  """
  n = mapping.num_points
  tw = mapping.tiles_wide
  th = mapping.tiles_high
  t_total = mapping.num_tiles
  gw = mapping.group_width
  r_rows = t_total * run_cap

  # --- canonicalise + sum the 9 slabs -----------------------------------
  # Group-slot position j of group (gy, gx) holds home gx-1+j; slab (b,k)
  # owns positions [k, gw+k).  Concatenating owned windows group-major and
  # shifting by ((b-1)*tw + (k-1))*run_cap aligns slab (b,k) to canonical
  # home-major rows (ownership tiles each band exactly).  Validity of a
  # cell depends only on its home id — elementwise in the row index.
  row = jnp.arange(r_rows, dtype=jnp.int32)
  h = row // run_cap
  hb = h // tw
  hx = h % tw

  # Work COLUMN-WISE in dense 1D (R,) arrays throughout: any (R, slabw)
  # intermediate would tile-pad 12.8x in HBM (T(8,128) on a 10-wide minor
  # dim) — at headline scale that alone OOMs the chip.
  acc_cols = [jnp.zeros((r_rows,), jnp.float32) for _ in range(slabw)]
  for b in range(3):
    tile_band = hb - b + 1
    band_ok = (tile_band >= 0) & (tile_band < th)
    for k in range(3):
      c0 = (b * 3 + k) * slabw
      tile_x = hx + 1 - k
      valid = band_ok & (tile_x >= 0) & (tile_x < tw)
      shift = ((b - 1) * tw + (k - 1)) * run_cap
      for c in range(slabw):
        col = gout[:, k * run_cap:(k + gw) * run_cap, c0 + c]
        col = col.reshape(r_rows).astype(jnp.float32)
        if shift > 0:
          col = jnp.concatenate(
              [jnp.zeros((shift,), col.dtype), col[:-shift]], 0)
        elif shift < 0:
          col = jnp.concatenate(
              [col[-shift:], jnp.zeros((-shift,), col.dtype)], 0)
        acc_cols[c] = acc_cols[c] + jnp.where(valid, col, 0.0)

  # --- compact away run padding (stable sort by is-padding) -------------
  run_lens = jnp.minimum(mapping.run_starts[1:] - mapping.run_starts[:-1],
                         run_cap)
  pad_row = (row % run_cap) >= jnp.repeat(run_lens, run_cap)
  ops = (pad_row.astype(jnp.int32),) + tuple(acc_cols)
  s = jax.lax.sort(ops, num_keys=1, is_stable=True)
  g_home = jnp.stack(s[1:], -1)[:n]      # (N, slabw), home-sorted order

  # --- inverse permutation: home order -> caller's point order ----------
  pid = _bitcast_i(mapping.table[:n, -1])
  ops2 = (pid,) + tuple(g_home[:, c] for c in range(slabw))
  s2 = jax.lax.sort(ops2, num_keys=1)
  return jnp.stack(s2[1:], -1)


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
    config: RasterConfig, run_cap: int = 0):
  """Rasterize with a precomputed stream mapping.  Returns
  (image (H, W, F), image_weight (H, W)).

  The mapping's sorted table is the data source; callers must pass the
  same arrays the mapping was built from (gradients are defined w.r.t.
  them, like the sorted pipeline's payload path)."""
  assert config.use_alpha_blending and not config.antialias, (
      "stream pipeline v1 supports plain alpha blending only")
  f = features.shape[1]
  raster = _stream_function(config, run_cap or mapping.run_cap)
  image_tiled = raster(gaussians2d, features, mapping)
  full = detile(image_tiled, mapping.tiles_wide, mapping.tiles_high,
                config.tile_size, image_size)
  return full[..., :f], full[..., f]
