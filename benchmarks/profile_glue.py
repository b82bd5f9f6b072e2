"""Bisect the gap between sum-of-stages and the full fwd+bwd graph.

Times: (a) loss forward alone (fwd + loss reduction), (b) the vjp
pullback alone (precomputed cotangent -> bwd kernel + reduce + unpack),
(c) full grad, (d) reduce with slabw columns but fed by a precomputed
gout, (e) bwd kernel fed by a precomputed (non-fused) cotangent.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_glue.py
"""

from __future__ import annotations

import sys

import numpy as np


def main():
  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from bench import IMAGE_SIZE, N, uniform_scene
  from tpu_splatting import RasterConfig
  from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
  from tpu_splatting.rasterizer.stream_function import (
      entile, probe_width, stream_rasterize_with_mapping, tile_mask)
  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(0)
  packed, depth, feats = uniform_scene(rng, N, IMAGE_SIZE)
  packed = jnp.asarray(packed)
  depth = jnp.asarray(depth)
  feats = jnp.asarray(feats)

  config = RasterConfig(compute_point_heuristic=True,
                        compute_visibility=True)
  gw = 2
  cal = calibrate_stream(packed, depth, feats, IMAGE_SIZE, config,
                         group_width=gw)
  caps = dict(num_slabs=cal["num_slabs"], strip_cap=cal["strip_cap"],
              slab_cap=cal["slab_cap"], group_width=gw,
              w_max=cal["w_max"], run_cap=cal["run_cap"],
              wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])
  m = jax.jit(lambda p, d, f: stream_map(p, d, f, IMAGE_SIZE, config,
                                         **caps))(packed, depth, feats)
  print(f"# overflow {int(m.num_overflow)}", file=sys.stderr)

  rngt = np.random.default_rng(7)
  tgt_full = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))
  tgt = entile(tgt_full, m.tiles_wide, m.tiles_high, config.tile_size)
  mask = tile_mask(IMAGE_SIZE, m.tiles_wide, m.tiles_high, config.tile_size)
  pw = probe_width(config)
  it = 3

  def loss_of(it_img, tgt, mask):
    err = it_img[:, :3, :] - tgt
    return (jnp.sum(mask * (err * err))
            + jnp.sum(mask[:, 0, :] * it_img[:, 3, :]))

  # (a) loss forward alone
  def fwd_loss(p, f, tgt, mask, mapping):
    probe = jnp.zeros((p.shape[0], pw), p.dtype)
    img = stream_rasterize_with_mapping(
        p, f, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
    return loss_of(img, tgt, mask)

  benchmarked("fwd+loss", fwd_loss, (packed, feats, tgt, mask, m), iters=it)

  # (b) pullback alone: vjp closure built outside the timed region is not
  # possible (vjp carries traced residuals) — instead time grad of a
  # LINEARIZED surrogate: feed the cotangent image directly to the
  # custom_vjp backward by calling vjp inside jit but with the forward
  # CSE'd away via precomputed image (can't — custom_vjp recomputes).
  # Pragmatic split: time grad wrt features ONLY (same bwd kernel +
  # reduce; unpack drops other columns) — graph identical minus nothing.
  def grad_feats(p, f, tgt, mask, mapping):
    probe = jnp.zeros((p.shape[0], pw), p.dtype)

    def loss(f):
      img = stream_rasterize_with_mapping(
          p, f, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
      return loss_of(img, tgt, mask)

    return jax.grad(loss)(f)

  benchmarked("grad(feats only)", grad_feats, (packed, feats, tgt, mask, m),
              iters=it)

  # (c) full grad (reference point)
  def fwd_bwd(p, f, tgt, mask, mapping):
    probe = jnp.zeros((p.shape[0], pw), p.dtype)

    def loss(p, f, probe):
      img = stream_rasterize_with_mapping(
          p, f, mapping, IMAGE_SIZE, config, probe=probe, tiled=True)
      return loss_of(img, tgt, mask)

    return jax.grad(loss, argnums=(0, 1, 2))(p, f, probe)

  benchmarked("full grad", fwd_bwd, (packed, feats, tgt, mask, m), iters=it)


if __name__ == "__main__":
  main()
