"""Differentiable rasterization API (custom_vjp around the Pallas kernels).

TPU-native equivalent of the reference autograd wrapper
(/root/reference/taichi_splatting/rasterizer/function.py:28-165).  Notable
design differences:

* **No per-overlap gather, ever.**  The tile mapper sorts the candidate
  domain with point/feature rows riding the sort as payload (XLA's sort
  moves payload columns almost for free on TPU, while random row gathers
  run ~600x off HBM bandwidth); the Pallas window-copy kernel lays the
  sorted rows out chunk-aligned with one contiguous DMA per chunk.

* **No atomics, no scatter.**  Per-overlap gradients are written
  contiguously by the backward kernel (the reference uses warp-reduced
  atomics, backward.py:199-224), sorted by point id (payload riding again)
  and reduced by the sorted-segment-sum Pallas kernel: one-hot matmuls on
  the MXU over contiguous input windows.

* **image_alpha is differentiable.**  The alpha image is composited as an
  extra channel inside the kernel (the reference marks it
  non-differentiable, function.py:73).

* **Point heuristics as probe gradients.**  The reference fills
  ``point_heuristic`` during backward by mutating a forward output
  (function.py:52-92) — impossible under jit.  Here ``rasterize`` accepts a
  zero-valued ``heuristic_probe`` input whose *cotangent* is defined to be
  the heuristics, so trainers obtain them with
  ``jax.grad(loss, argnums=probe)`` in the same backward pass (or use
  ``renderer.render_with_heuristics``).

* **Quantile (non-blending) mode is forward-only** — the reference's
  backward silently computes blending-mode gradients for it (its
  ``use_alpha_blending`` flag never reaches backward.py), and its
  no-blending gradcheck is disabled (tests/test_rasterizer.py:92-101).  We
  stop gradients instead of returning wrong ones.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data_types import RasterConfig
from ..mapper.tile_mapper import TileMapping, map_to_tiles, tile_shape
from . import kernels
from .layout import segment_sum_sorted, window_copy


class RasterOut(NamedTuple):
  """Parity with reference RasterOut (function.py:19-24)."""
  image: jnp.ndarray                      # (H, W, F)
  image_weight: jnp.ndarray               # (H, W)
  point_heuristic: Optional[jnp.ndarray]  # (N, 2) — via probe gradient
  visibility: Optional[jnp.ndarray]       # (N,)
  num_overflow: Optional[jnp.ndarray] = None  # () i32 — rows dropped by
  # static capacity clamps when the op built its own mapping (assert == 0
  # once per scene family; resize via calibrate_stream / max_overlaps)


def _float0(x):
  return np.zeros(x.shape, jax.dtypes.float0)


def _kernel_inputs(mapping: TileMapping, gaussians2d, features):
  """(sorted_rows, chunk_src, chunk_cnt) for the raster kernels.

  Fast path: the mapper's sorted payload feeds the kernels directly (the
  in-kernel window fetch does the chunk layout).  Fallback (mapping built
  without features, or with a different feature width — e.g. the
  median-depth second pass): XLA-gather a chunk-aligned buffer and use
  identity windows."""
  g = mapping.chunk_size
  if (mapping.sorted_payload is not None
      and mapping.feature_size == features.shape[1]):
    return mapping.sorted_payload, mapping.chunk_src, mapping.chunk_cnt
  n = mapping.num_points
  rows = jnp.concatenate([gaussians2d, features.astype(gaussians2d.dtype)],
                         -1)
  rows_ext = jnp.concatenate(
      [rows, jnp.zeros((1, rows.shape[1]), rows.dtype)], 0)
  pid = mapping.point_id_chunked
  chunked = rows_ext[pid]
  # identity windows: chunk k reads rows [k*g, (k+1)*g); one block of slack
  chunked = jnp.concatenate(
      [chunked, jnp.zeros((g, rows.shape[1]), rows.dtype)], 0)
  k = mapping.num_chunks
  src = jnp.arange(k, dtype=jnp.int32) * g
  return chunked, src, mapping.chunk_cnt


def _pid_chunked(mapping: TileMapping):
  """(A, 1) i32 point ids per chunk slot (null = num_points), via the same
  window-copy kernel (ids ride BY VALUE — exact in f32 below 2^24; bitcast
  storage flushes denormal bit patterns to zero on TPU)."""
  n = mapping.num_points
  assert n < (1 << 24), "point id exceeds f32 exact-int range"
  o2p = mapping.overlap_to_point
  as_f32 = o2p.astype(jnp.float32)[:, None]
  copied = window_copy(as_f32, mapping.chunk_src, mapping.chunk_cnt,
                       mapping.chunk_size)
  pid = copied[:, 0].astype(jnp.int32)
  # window_copy zero-fills invalid slots; value 0 is a REAL
  # point id, so rebuild the null sentinel from the validity pattern
  k = mapping.num_chunks
  g = mapping.chunk_size
  r = jnp.arange(g, dtype=jnp.int32)[None, :]
  valid = (r < mapping.chunk_cnt[:, None]).reshape(-1)
  return jnp.where(valid, pid, n)


def reduce_chunked_to_points(x_chunked: jnp.ndarray, pid: jnp.ndarray,
                             num_points: int) -> jnp.ndarray:
  """Sum per-chunk-slot rows (A, C) into per-point rows (N, C): sort rows
  by point id (payload rides the sort) + sorted-segment-sum on the MXU.
  Wide rows are reduced in <=15-column groups (packed-lane kernel limit)."""
  c = x_chunked.shape[1]
  ops = (pid,) + tuple(x_chunked[:, i] for i in range(c))
  sorted_ops = jax.lax.sort(ops, num_keys=1)
  ids = sorted_ops[0]
  cols = sorted_ops[1:]
  outs = []
  for lo in range(0, c, 15):
    rows_sorted = jnp.stack(cols[lo:lo + 15], -1)
    outs.append(segment_sum_sorted(rows_sorted, ids, num_points))
  return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


@lru_cache(maxsize=None)
def _raster_function(config: RasterConfig, num_tiles: int, tiles_wide: int,
                     num_points: int, feature_size: int, with_vis: bool):
  """Cached custom_vjp rasterizer specialised on static shape/config
  (the jit analogue of the reference's @cache kernel factories,
  function.py:28-40)."""
  n, f = num_points, feature_size

  @jax.custom_vjp
  def raster(gaussians2d, features, probe, mapping):
    rows, src, cnt = _kernel_inputs(mapping, gaussians2d, features)
    return kernels.forward(rows, src, cnt, mapping.chunk_to_tile, config,
                           num_tiles, tiles_wide, with_vis=with_vis)

  def fwd(gaussians2d, features, probe, mapping):
    rows, src, cnt = _kernel_inputs(mapping, gaussians2d, features)
    image_tiled, vis_chunked = kernels.forward(
        rows, src, cnt, mapping.chunk_to_tile, config, num_tiles, tiles_wide,
        with_vis=with_vis)
    residuals = (rows, src, cnt, image_tiled, mapping)
    return (image_tiled, vis_chunked), residuals

  def bwd(residuals, cotangents):
    rows, src, cnt, image_tiled, mapping = residuals
    g_image_tiled, _g_vis = cotangents   # visibility is non-differentiable

    gout = kernels.backward(
        rows, image_tiled, g_image_tiled, src, cnt, mapping.chunk_to_tile,
        config, num_tiles, tiles_wide)

    # reduce per-overlap gradients to points in ONE combined pass
    # (replaces the reference's warp-reduced atomics, backward.py:199-224)
    pid = _pid_chunked(mapping)
    reduced = reduce_chunked_to_points(gout, pid, n)
    g_gaussians2d = reduced[:, :7]
    g_features = reduced[:, 7:7 + f]
    if config.compute_point_heuristic:
      heur_n = reduced[:, 7 + f:7 + f + 2]
    else:
      heur_n = jnp.zeros((n, 2), g_gaussians2d.dtype)

    return (g_gaussians2d, g_features.astype(g_gaussians2d.dtype),
            heur_n.astype(g_gaussians2d.dtype),
            jax.tree.map(_float0, mapping))

  raster.defvjp(fwd, bwd)
  return raster


def rasterize_with_tiles(
    gaussians2d: jnp.ndarray,    # (N, 7)
    features: jnp.ndarray,       # (N, F)
    mapping: TileMapping,
    image_size: Tuple[int, int],
    config: RasterConfig,
    heuristic_probe: Optional[jnp.ndarray] = None,   # (N, 2)
) -> RasterOut:
  """Rasterize with a precomputed tile mapping (reference function.py:100-131).

  If the mapping was built with ``features`` (the fast path used by
  ``rasterize``/``render_gaussians``), its sorted payload feeds the kernels
  directly; otherwise the rows are gathered from the arguments.  Callers
  must pass the same arrays the mapping was built from.

  ``heuristic_probe`` is an all-zeros (N, 2) array; its gradient under any
  loss equals the reference's point heuristics (prune_cost, split_score).
  """
  n, f = features.shape
  assert gaussians2d.shape == (n, 7), gaussians2d.shape
  dtype = gaussians2d.dtype
  tw, th = tile_shape(image_size, config.tile_size)
  num_tiles = tw * th
  ts = config.tile_size

  if heuristic_probe is None:
    heuristic_probe = jnp.zeros((n, 2), dtype)

  with_vis = config.compute_visibility or config.compute_point_heuristic
  raster = _raster_function(config, num_tiles, tw, n, f, with_vis)
  image_tiled, vis_chunked = raster(
      gaussians2d, features, heuristic_probe, mapping)

  if not config.use_alpha_blending:
    image_tiled = jax.lax.stop_gradient(image_tiled)
    vis_chunked = jax.lax.stop_gradient(vis_chunked)

  # de-tile: (T+1, F+1, PIX) -> (H, W, F+1)
  w_img, h_img = image_size
  tiled = image_tiled[:num_tiles].reshape(th, tw, f + 1, ts, ts)
  full = tiled.transpose(0, 3, 1, 4, 2).reshape(th * ts, tw * ts, f + 1)
  full = full[:h_img, :w_img]

  image = full[..., :f]
  image_alpha = full[..., f]

  visibility = None
  if with_vis:
    pid = _pid_chunked(mapping)
    # stop the gradient BEFORE the reduction: the scalar-prefetch Pallas
    # kernels have no JVP rule, and visibility is non-differentiable anyway
    visibility = reduce_chunked_to_points(
        jax.lax.stop_gradient(vis_chunked), pid, n)[:, 0]

  return RasterOut(image=image, image_weight=image_alpha,
                   point_heuristic=None, visibility=visibility)


def rasterize(gaussians2d: jnp.ndarray, depth: jnp.ndarray,
              features: jnp.ndarray, image_size: Tuple[int, int],
              config: RasterConfig, use_depth16: bool = False,
              max_overlaps: Optional[int] = None,
              heuristic_probe: Optional[jnp.ndarray] = None,
              probe: Optional[jnp.ndarray] = None) -> RasterOut:
  """Map to tiles + rasterize (reference function.py:133-165).

  Routes through the tile-stream pipeline when ``config.pipeline`` allows
  (the fast path), else the sorted-overlap pipeline.  On the stream path
  per-point outputs are backward-pass products: ``visibility`` is None in
  the forward (pass a full ``probe`` of width ``probe_width(config)`` —
  columns [visibility, prune, split] — and read its gradient, or use the
  renderer's render_with_heuristics helpers); ``heuristic_probe``'s
  gradient carries (prune_cost, split_score) on both pipelines.
  """
  assert gaussians2d.shape[0] == depth.shape[0] == features.shape[0]
  from .stream_function import (probe_width, stream_eligible,
                                stream_map_with_config,
                                stream_rasterize_with_mapping)

  if stream_eligible(config, image_size):
    n = gaussians2d.shape[0]
    mapping = stream_map_with_config(
        jax.lax.stop_gradient(gaussians2d), jax.lax.stop_gradient(depth),
        jax.lax.stop_gradient(features), image_size, config)
    pw = probe_width(config)
    if probe is None and heuristic_probe is not None and pw >= 2:
      # heur probe contract: prepend the visibility column so the caller's
      # (N, 2) probe still receives (prune, split) through the concat vjp
      probe = jnp.concatenate(
          [jnp.zeros((n, pw - 2), gaussians2d.dtype), heuristic_probe], -1)
    image, image_weight = stream_rasterize_with_mapping(
        gaussians2d, features, mapping, image_size, config, probe=probe)
    return RasterOut(image=image, image_weight=image_weight,
                     point_heuristic=None, visibility=None,
                     num_overflow=mapping.num_overflow)

  mapping = map_to_tiles(
      jax.lax.stop_gradient(gaussians2d), jax.lax.stop_gradient(depth),
      image_size=image_size, config=config, max_overlaps=max_overlaps,
      use_depth16=use_depth16,
      features=jax.lax.stop_gradient(features))

  return rasterize_with_tiles(
      gaussians2d, features, mapping, image_size=image_size, config=config,
      heuristic_probe=heuristic_probe)._replace(
          num_overflow=mapping.num_overflow)
