"""Top-level 3D renderer composition.

TPU-native equivalent of /root/reference/taichi_splatting/renderer.py:23-118:
projection -> (optional SH shading) -> NDC depth -> tile mapping ->
rasterization -> (optional second non-blending pass for median depth).
Fully jit-compatible (static shapes; ``image_size`` and config are static).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .data_types import Gaussians3D, RasterConfig
from .mapper.tile_mapper import map_to_tiles
from .perspective.params import CameraParams
from .perspective.projection import ndc_depth, project_to_image
from .rasterizer.function import rasterize_with_tiles
from .rendering import RenderedPoints, Rendering
from .spherical_harmonics import evaluate_sh_at


def render_gaussians(
    gaussians: Gaussians3D,
    camera_params: CameraParams,
    config: RasterConfig = RasterConfig(),
    use_sh: bool = False,
    render_depth: bool = False,
    use_depth16: bool = False,
    render_median_depth: bool = False,
    max_overlaps: Optional[int] = None,
    heuristic_probe: Optional[jnp.ndarray] = None,
    probe: Optional[jnp.ndarray] = None,
    tiled: bool = False,
) -> Rendering:
  """Complete 3D gaussian renderer (reference renderer.py:23-59).

  Args mirror the reference; ``max_overlaps`` sets the static overlap
  capacity (sorted pipeline) and ``heuristic_probe`` is the zero-valued
  (N, 2) array whose gradient carries (prune_cost, split_score).
  ``probe`` is the stream pipeline's full (N, probe_width(config)) probe
  ([visibility, prune, split] cotangent columns).  ``tiled`` (stream
  pipeline only) keeps the Rendering's image fields in tile layout —
  training losses then never pay the detile/entile transposes (see
  Rendering docstring).
  """
  gaussians2d, depths, in_view = project_to_image(
      gaussians, camera_params, config)

  if use_sh:
    features = evaluate_sh_at(
        gaussians.feature, jax.lax.stop_gradient(gaussians.position),
        camera_params.camera_position)
  else:
    features = gaussians.feature
    assert features.ndim == 2, (
        f"Features must be (N, C) if use_sh=False, got {features.shape}")

  return render_projected(
      in_view, gaussians2d, features, depths, camera_params, config,
      use_depth16=use_depth16, render_median_depth=render_median_depth,
      render_depth=render_depth, max_overlaps=max_overlaps,
      heuristic_probe=heuristic_probe, probe=probe, tiled=tiled)


def render_projected(
    in_view: jnp.ndarray,
    gaussians2d: jnp.ndarray,
    features: jnp.ndarray,
    depths: jnp.ndarray,
    camera_params: CameraParams,
    config: RasterConfig,
    use_depth16: bool = False,
    render_median_depth: bool = False,
    render_depth: bool = False,
    max_overlaps: Optional[int] = None,
    heuristic_probe: Optional[jnp.ndarray] = None,
    probe: Optional[jnp.ndarray] = None,
    tiled: bool = False,
) -> Rendering:
  """Rasterize already-projected gaussians (reference renderer.py:62-108).

  Routes through the tile-stream pipeline when ``config.pipeline`` allows.
  On that path per-point visibility is a backward product: training code
  should use ``render_with_heuristics`` (or thread ``probe`` and read its
  gradient), which gets it for free from the backward pass it runs anyway.
  When ``config.compute_visibility`` is set and no ``probe`` is threaded,
  this function still honours the request by running one extra
  zero-cotangent backward dispatch (gradient-stopped), so
  ``rendering.points.visibility`` works on BOTH pipelines.

  ``use_depth16`` only affects the sorted pipeline's key layout; the
  stream pipeline ALWAYS composites in quantized-depth order (14- or
  12-bit keys, stream.depth_bits_for), so the flag is vacuous there.
  """
  from .rasterizer.stream_function import (probe_width, stream_eligible,
                                           stream_map_with_config,
                                           stream_rasterize_with_mapping)
  image_size = camera_params.image_size
  ndc_depths = ndc_depth(depths, camera_params.near_plane,
                         camera_params.far_plane)
  # culled points have depth 0 sentinel -> keep the mapper's invalid mask
  ndc_depths = jnp.where(depths > 0, ndc_depths, 0.0)
  use_stream = stream_eligible(config, image_size)

  if render_depth:
    # composite (feature, depth, depth^2) in one pass -> expectation depth
    feats_all = jnp.concatenate([features, depths, depths ** 2], -1)
  elif render_median_depth and use_stream:
    # the stream median pass reuses the mapping's table, so the depth
    # must ride it as a feature channel
    feats_all = jnp.concatenate([features, depths], -1)
  else:
    feats_all = features
  f = features.shape[1]
  sg = jax.lax.stop_gradient

  assert not tiled or use_stream, (
      "tiled rendering output is a stream-pipeline feature")
  if use_stream:
    mapping = stream_map_with_config(
        sg(gaussians2d), sg(ndc_depths), sg(feats_all), image_size, config)
    pw = probe_width(config)
    if probe is None and heuristic_probe is not None and pw >= 2:
      n = gaussians2d.shape[0]
      probe = jnp.concatenate(
          [jnp.zeros((n, pw - 2), gaussians2d.dtype), heuristic_probe], -1)
    f_all = feats_all.shape[1]
    out = stream_rasterize_with_mapping(
        gaussians2d, feats_all, mapping, image_size, config, probe=probe,
        tiled=tiled)
    if tiled:
      it = out                                    # (T, F_all+1, PIX)
      image = it[:, :f, :]
      image_weight = it[:, f_all, :]
      depth_image = (it[:, f, :] / jnp.maximum(image_weight, 1e-10)
                     if render_depth else None)
    else:
      img_full, image_weight = out
      depth_image = (img_full[..., f] / jnp.maximum(image_weight, 1e-10)
                     if render_depth else None)
      image = img_full[..., :f]
    median_depth = None
    if render_median_depth:
      median_cfg = dataclasses.replace(
          config, use_alpha_blending=False,
          saturate_threshold=config.median_threshold)
      med_all = stream_rasterize_with_mapping(
          sg(gaussians2d), sg(feats_all), mapping, image_size, median_cfg,
          tiled=tiled)
      median_depth = med_all[:, f, :] if tiled else med_all[0][..., f]
    visibility = None
    if config.compute_visibility and probe is None:
      # no probe threaded (analysis/eval path, not a training step):
      # visibility = cotangent of probe column 0 under a ZERO image
      # cotangent (it is sum-of-compositing-weights, independent of the
      # loss), computed by one extra gradient-stopped backward dispatch.
      # Trainers get it free via render_with_heuristics instead.
      pw = probe_width(config)
      probe0 = jnp.zeros((gaussians2d.shape[0], pw), gaussians2d.dtype)

      def probe_only(pr):
        return stream_rasterize_with_mapping(
            sg(gaussians2d), sg(feats_all), mapping, image_size, config,
            probe=pr, tiled=True)

      it_p, vjp = jax.vjp(probe_only, probe0)
      (gpr,) = vjp(jnp.zeros_like(it_p))
      visibility = sg(gpr[:, 0])
  else:
    mapping = map_to_tiles(
        sg(gaussians2d), sg(ndc_depths),
        image_size=image_size, config=config,
        max_overlaps=max_overlaps, use_depth16=use_depth16,
        features=sg(feats_all))

    raster = rasterize_with_tiles(
        gaussians2d, feats_all, mapping,
        image_size=image_size, config=config,
        heuristic_probe=heuristic_probe)

    depth_image = None
    if render_depth:
      depth_image = raster.image[..., f] / jnp.maximum(raster.image_weight,
                                                       1e-10)
    image = raster.image[..., :f]
    image_weight = raster.image_weight

    median_depth = None
    if render_median_depth:
      median_cfg = dataclasses.replace(
          config, use_alpha_blending=False,
          saturate_threshold=config.median_threshold)
      raster_depth = rasterize_with_tiles(
          sg(gaussians2d), sg(depths),
          mapping, image_size=image_size, config=median_cfg)
      median_depth = raster_depth.image[..., 0]
    visibility = raster.visibility

  points = RenderedPoints(
      in_view=in_view,
      depths=depths,
      gaussians2d=gaussians2d,
      features=features,
      _visibility=visibility,
      _prune_cost=None,
      _split_score=None,
  )

  return Rendering(
      image=image,
      image_weight=image_weight,
      depth_image=depth_image,
      median_depth_image=median_depth,
      points=points,
      camera=camera_params,
      config=config,
      num_overflow=mapping.num_overflow,
      overflow_by_cause=getattr(mapping, "overflow", None),
      tiled=tiled,
  )


def render_with_heuristics(
    loss_fn,
    gaussians: Gaussians3D,
    camera_params: CameraParams,
    config: RasterConfig = RasterConfig(),
    **render_kwargs,
):
  """Render, evaluate ``loss_fn(rendering)``, and run the backward pass,
  returning ``(loss, rendering, grads)`` with per-point heuristics populated.

  Parity with the reference, where the backward kernel fills
  ``point_heuristic`` on the forward output in place
  (/root/reference/taichi_splatting/rendering.py:41-54,
  rasterizer/backward.py:190-194) — impossible under jit, so the probe
  cotangent threading happens here instead of in every trainer:
  ``rendering.points.prune_cost`` / ``split_score`` are the gradients of a
  zero-valued probe input computed in the same backward pass as ``grads``.

  Args:
    loss_fn: Rendering -> scalar loss (may close over targets/regularizers).
    gaussians / camera_params / config: as for ``render_gaussians``.
    **render_kwargs: forwarded to ``render_gaussians``.

  Returns:
    (loss, rendering, grads): grads is a Gaussians3D cotangent pytree.
  """
  assert config.compute_point_heuristic, (
      "render_with_heuristics requires config.compute_point_heuristic")
  from .rasterizer.stream_function import probe_width, stream_eligible
  n = gaussians.position.shape[0]
  use_stream = stream_eligible(config, camera_params.image_size)
  # stream path: the probe gains a leading visibility column whose gradient
  # fills points.visibility (the sorted pipeline computes it in forward)
  pw = probe_width(config) if use_stream else 2
  probe = jnp.zeros((n, pw), gaussians.position.dtype)

  def wrapped(g, probe):
    kw = {"probe": probe} if use_stream else {"heuristic_probe": probe}
    rendering = render_gaussians(g, camera_params, config,
                                 **kw, **render_kwargs)
    return loss_fn(rendering), rendering

  (loss, rendering), (grads, gpr) = jax.value_and_grad(
      wrapped, argnums=(0, 1), has_aux=True)(gaussians, probe)
  points = rendering.points.replace(
      _prune_cost=gpr[:, pw - 2], _split_score=gpr[:, pw - 1])
  if use_stream and pw == 3:
    points = points.replace(_visibility=gpr[:, 0])
  return loss, rendering.replace(points=points), grads


def viewspace_gradient(grad_gaussians2d: jnp.ndarray) -> jnp.ndarray:
  """Norm of the xy gradient (densify heuristic, renderer.py:113-118).

  Takes the gradient array directly (JAX has no .grad attribute): pass
  ``jax.grad(loss)(gaussians2d)``.
  """
  assert grad_gaussians2d.shape[1] == 7
  return jnp.linalg.norm(grad_gaussians2d[:, :2], axis=1)
