"""Bisect INSIDE the backward composition.

Variants of the custom_vjp backward (local copies, not the library):
  v0: bwd kernel with a CONSTANT cotangent (ones) + no reduce
  v1: bwd kernel with the REAL (loss-fused) cotangent + no reduce
  v2: real cotangent + reduce (the production path)
  v3: real cotangent, bwd kernel, reduce replaced by a cheap sum

v1 - v0 = cost of feeding a fused cotangent into the pallas kernel
(relayout). v2 - v1 = reduce-in-graph cost vs its isolated 84 ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_glue2.py
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
      entile, probe_width, stream_reduce, tile_mask)
  from tpu_splatting.rasterizer.stream_kernels import (
      slab_width, stream_backward, stream_forward)
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
  f = m.feature_size
  slabw = slab_width(config, f)
  run_cap = m.run_cap

  rngt = np.random.default_rng(7)
  tgt_full = jnp.asarray(
      rngt.random((IMAGE_SIZE[1], IMAGE_SIZE[0], 3)).astype(np.float32))
  tgt = entile(tgt_full, m.tiles_wide, m.tiles_high, config.tile_size)
  mask = tile_mask(IMAGE_SIZE, m.tiles_wide, m.tiles_high, config.tile_size)
  it = 3

  def cotangent(img, tgt, mask):
    # d/dimg of sum(mask*err^2) + sum(mask[:,0,:]*img[:,3,:])
    err = img[:, :3, :] - tgt
    g_rgb = 2.0 * mask * err
    g_a = jnp.broadcast_to(mask[:, 0:1, :], img[:, 3:4, :].shape)
    return jnp.concatenate([g_rgb, g_a], 1)

  def v0(mapping, tgt, mask):
    img = stream_forward(mapping, config)
    gi = jnp.ones_like(img)
    gout = stream_backward(mapping, img, gi, config, run_cap)
    return jnp.sum(gout[:, :8, :])

  def v1(mapping, tgt, mask):
    img = stream_forward(mapping, config)
    gi = cotangent(img, tgt, mask)
    gout = stream_backward(mapping, img, gi, config, run_cap)
    return jnp.sum(gout[:, :8, :])

  def v2(mapping, tgt, mask):
    img = stream_forward(mapping, config)
    gi = cotangent(img, tgt, mask)
    gout = stream_backward(mapping, img, gi, config, run_cap)
    red = stream_reduce(gout, mapping, run_cap, slabw)
    return red

  def v3(mapping, tgt, mask):
    img = stream_forward(mapping, config)
    gi = cotangent(img, tgt, mask)
    gout = stream_backward(mapping, img, gi, config, run_cap)
    return jnp.sum(gout, (0, 1))

  which = sys.argv[1] if len(sys.argv) > 1 else "all"
  if which in ("v0", "all"):
    benchmarked("v0 const-cotangent fwd+bwd", v0, (m, tgt, mask), iters=it)
  if which in ("v1", "all"):
    benchmarked("v1 fused-cotangent fwd+bwd", v1, (m, tgt, mask), iters=it)
  if which in ("v3", "all"):
    benchmarked("v3 v1+sum(gout)", v3, (m, tgt, mask), iters=it)
  if which in ("v2", "all"):
    benchmarked("v2 v1+reduce", v2, (m, tgt, mask), iters=it)


if __name__ == "__main__":
  main()
