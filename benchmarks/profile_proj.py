"""Decompose the full-renderer glue: projection + SH + layout (VERDICT r4 #3).

The r4 headline exposed ~273 ms between the 2D raster step (242.6 ms incl.
map) and the full dispatch (515.9 ms) — projection + SH fwd+bwd + the
detiled loss.  Reference share: projection + SH + their backwards are ~11%
of the frame (/root/reference/profiles/bicycle_2048.txt:33-60).  This
harness times each glue stage in isolation on the chip, with the same
benchmarked() scan protocol as bench.py.

Stages:
  proj fwd           — project_to_image alone
  proj fwd+bwd       — + gradients to every Gaussians3D leaf + camera
  sh fwd             — evaluate_sh_at alone (deg 3)
  sh fwd+bwd         — + gradients to coefficients
  ndc                — ndc_depth + where
  detile fwd         — (T, F+1, PIX) -> (H, W, C) alone
  detile loss f+b    — tiled img -> detile -> l2 loss -> grad (the
                       production loss layout chain)
  tiled loss f+b     — same loss computed in tile layout (target entiled
                       once outside)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_proj.py
"""

from __future__ import annotations

import sys

import numpy as np


def main():
  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import IMAGE_SIZE, N, lift_to_3d, uniform_scene, _trainer_config
  from tpu_splatting.perspective.projection import ndc_depth, project_to_image
  from tpu_splatting.rasterizer.stream_function import (detile, entile,
                                                        tile_mask)
  from tpu_splatting.mapper.tile_mapper import tile_shape
  from tpu_splatting.spherical_harmonics import evaluate_sh_at
  from tpu_splatting.utils.benchmarked import benchmarked

  config = _trainer_config(8)
  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  g3d, cam = lift_to_3d(packed, depth, feats, IMAGE_SIZE,
                        near=0.1, far=100.0, fov_deg=70.0)

  def proj(g):
    return project_to_image(g, cam, config)

  def proj_grad(g):
    def l(g):
      g2, d, _ = proj(g)
      return jnp.sum(g2 * g2) + jnp.sum(d)
    return jax.grad(l)(g)

  def sh(g):
    return evaluate_sh_at(g.feature, jax.lax.stop_gradient(g.position),
                          cam.camera_position)

  def sh_grad(g):
    return jax.grad(lambda g: jnp.sum(sh(g) ** 2))(g)

  def ndc(d):
    nd = ndc_depth(d, cam.near_plane, cam.far_plane)
    return jnp.where(d > 0, nd, 0.0)

  tw, th = tile_shape(IMAGE_SIZE, config.tile_size)
  t_tiles = tw * th
  pix = config.tile_area
  rngt = np.random.default_rng(7)
  img_tiled = jnp.asarray(
      rngt.random((t_tiles, 4, pix)).astype(np.float32))
  tgt_full = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))
  tgt_tiled = entile(tgt_full, tw, th, config.tile_size)
  mask = tile_mask(IMAGE_SIZE, tw, th, config.tile_size)

  def detile_fwd(it):
    return detile(it, tw, th, config.tile_size, IMAGE_SIZE)

  def detiled_loss_grad(it):
    def l(it):
      full = detile_fwd(it)
      err = full[..., :3] - tgt_full
      return jnp.sum(err * err)
    return jax.grad(l)(it)

  def tiled_loss_grad(it):
    def l(it):
      err = it[:, :3, :] - tgt_tiled
      return jnp.sum(mask * (err * err))
    return jax.grad(l)(it)

  d_m = jnp.asarray(depth)
  benchmarked("proj fwd", proj, (g3d,), iters=10)
  benchmarked("proj fwd+bwd", proj_grad, (g3d,), iters=10)
  benchmarked("sh fwd", sh, (g3d,), iters=10)
  benchmarked("sh fwd+bwd", sh_grad, (g3d,), iters=10)
  benchmarked("ndc", ndc, (d_m,), iters=10)
  benchmarked("detile fwd", detile_fwd, (img_tiled,), iters=10)
  benchmarked("detile loss f+b", detiled_loss_grad, (img_tiled,), iters=10)
  benchmarked("tiled loss f+b", tiled_loss_grad, (img_tiled,), iters=10)


if __name__ == "__main__":
  main()
