"""Decompose the full-renderer headline step (bench.py bench_full_renderer).

Stages timed separately on the real chip:
  proj+sh fwd      — project_to_image + SH eval only
  map              — stream_map from pre-projected splats
  render fwd       — render_gaussians forward (no grad)
  raster fwd+bwd   — 2D-protocol raster step on the projected splats
  full step        — render_with_heuristics value_and_grad (the headline)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_full.py
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np


def main():
  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import (IMAGE_SIZE, N, _trainer_config, lift_to_3d,
                     uniform_scene)
  from tpu_splatting.perspective.projection import (ndc_depth,
                                                    project_to_image)
  from tpu_splatting.renderer import render_gaussians, render_with_heuristics
  from tpu_splatting.rasterizer.stream import calibrate_stream
  from tpu_splatting.spherical_harmonics import evaluate_sh_at
  from tpu_splatting.utils.benchmarked import benchmarked

  gw = 2
  config = _trainer_config(gw)
  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  g3d, cam = lift_to_3d(packed, depth, feats, IMAGE_SIZE,
                        near=0.1, far=100.0, fov_deg=70.0)

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    g3c = jax.device_put(jax.device_get(g3d), cpu)
    cac = jax.device_put(jax.device_get(cam), cpu)
    g2d, depths, _ = jax.jit(
        lambda g: project_to_image(g, cac, config))(g3c)
    nd = jnp.where(depths > 0,
                   ndc_depth(depths, cac.near_plane, cac.far_plane), 0.0)
    cal = calibrate_stream(
        g2d, nd, jax.device_put(jnp.asarray(feats), cpu), IMAGE_SIZE,
        config, group_width=gw)
  print(f"# cal: {cal}", file=sys.stderr)
  cfg = dataclasses.replace(
      config, stream_num_slabs=cal["num_slabs"],
      stream_strip_cap=cal["strip_cap"], stream_slab_cap=cal["slab_cap"],
      stream_w_max=cal["w_max"], stream_run_cap=cal["run_cap"],
      stream_wide_cap=cal["wide_cap"], stream_dup_cap=cal["dup_cap"],
      big_tile_window=cal["big_tile_window"])

  rngt = np.random.default_rng(7)
  tgt = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))

  def proj_sh(g):
    g2, d, iv = project_to_image(g, cam, cfg)
    f = evaluate_sh_at(g.feature, jax.lax.stop_gradient(g.position),
                       cam.camera_position)
    return g2, d, iv, f

  def render_fwd(g):
    return render_gaussians(g, cam, cfg, use_sh=True).image

  def loss_fn(rendering):
    err = rendering.image - tgt
    return jnp.sum(err * err)

  def full(g):
    loss, rendering, grads = render_with_heuristics(
        loss_fn, g, cam, cfg, use_sh=True)
    return loss, grads

  # grads of proj+sh alone (excludes raster): isolates the 3D bwd chain
  def proj_sh_grad(g):
    def l(g):
      g2, d, iv, f = proj_sh(g)
      return jnp.sum(g2 * g2) + jnp.sum(f * f) + jnp.sum(d)
    return jax.grad(l)(g)

  benchmarked("proj+sh fwd", proj_sh, (g3d,), iters=5)
  benchmarked("proj+sh fwd+bwd", proj_sh_grad, (g3d,), iters=5)
  benchmarked("render fwd", render_fwd, (g3d,), iters=3)
  benchmarked("full step", full, (g3d,), iters=3)


if __name__ == "__main__":
  main()
