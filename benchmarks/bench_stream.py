"""Benchmark the tile-stream pipeline on the real chip vs the sorted one."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting import RasterConfig
from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
from tpu_splatting.rasterizer.stream_function import (
    stream_rasterize_with_mapping)
from tpu_splatting.utils.benchmarked import benchmarked
from benchmarks.bench_components import synthetic_2d


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--width", type=int, default=1024)
  p.add_argument("--height", type=int, default=768)
  p.add_argument("--scale", type=float, default=4.0)
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--group-width", type=int, default=2)
  p.add_argument("--slab-cap", type=int, default=512)
  p.add_argument("--strip-cap", type=int, default=0)
  p.add_argument("--fwd-only", action="store_true")
  args = p.parse_args()

  image_size = (args.width, args.height)
  packed, depth, feats = synthetic_2d(args.n, image_size,
                                      scale_factor=args.scale)
  config = RasterConfig()
  gw = args.group_width

  cal = calibrate_stream(packed, depth, feats, image_size, config,
                         group_width=gw, slab_cap=args.slab_cap)
  print("# calibration:", cal)
  run_cap = cal["run_cap"]
  if args.strip_cap:
    assert 2 * args.strip_cap >= cal["max_strip_rows"]
    cal["strip_cap"] = args.strip_cap

  map_f = lambda p_, d_, f_: stream_map(
      p_, d_, f_, image_size, config, num_slabs=cal["num_slabs"],
      strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"], group_width=gw,
      w_max=cal["w_max"], run_cap=cal["run_cap"])
  m = jax.jit(map_f)(packed, depth, feats)
  print("# overflow:", int(m.num_overflow), "groups:", m.num_groups,
        "slabs:", m.num_slabs, "table:", m.table.shape)
  # a handful of reach>1 points (radius marginally over tile_size) may be
  # dropped; tolerate a negligible fraction in this component bench
  assert int(m.num_overflow) <= max(4, args.n // 100_000), int(m.num_overflow)

  it = args.iters
  benchmarked("stream_map", map_f, (packed, depth, feats), iters=it)

  fwd = lambda p_, f_, mm: stream_rasterize_with_mapping(
      p_, f_, mm, image_size, config, run_cap=run_cap)[0]
  benchmarked("stream_forward", fwd, (packed, feats, m), iters=it)
  if args.fwd_only:
    return

  def loss(p_, f_, mm):
    img, w = stream_rasterize_with_mapping(
        p_, f_, mm, image_size, config, run_cap=run_cap)
    return jnp.sum(img ** 2) + jnp.sum(w)
  benchmarked("stream_fwd_bwd", jax.grad(loss, argnums=(0, 1)),
              (packed, feats, m), iters=it)

  # isolate the backward kernel and the reduce
  from tpu_splatting.rasterizer.stream_kernels import (stream_backward,
                                                       stream_forward)
  from tpu_splatting.rasterizer.stream_function import stream_reduce
  img_tiled = jax.jit(lambda mm: stream_forward(mm, config))(m)
  gimg = jnp.ones_like(img_tiled)
  benchmarked("bwd_kernel_only", lambda mm, it_, gi: stream_backward(
      mm, it_, gi, config, run_cap), (m, img_tiled, gimg), iters=it)
  gout = jax.jit(lambda mm, it_, gi: stream_backward(
      mm, it_, gi, config, run_cap))(m, img_tiled, gimg)
  slabw = 7 + feats.shape[1]
  benchmarked("reduce_only", lambda go, mm: stream_reduce(
      go, mm, run_cap, slabw), (gout, m), iters=it)

  def e2e(p_, d_, f_):
    mm = map_f(jax.lax.stop_gradient(p_), d_, jax.lax.stop_gradient(f_))

    def inner(p__, f__):
      img, w = stream_rasterize_with_mapping(
          p__, f__, mm, image_size, config, run_cap=run_cap)
      return jnp.sum(img ** 2) + jnp.sum(w)
    return jax.grad(inner, argnums=(0, 1))(p_, f_)
  benchmarked("stream_e2e_map_fwd_bwd", e2e, (packed, depth, feats),
              iters=it)


if __name__ == "__main__" and not any(
    a in __import__("sys").argv for a in ("--profile-fwd", "--profile-bwd")):
  main()


def profile_fwd():
  """Ablation profile of the forward kernel at a given scene."""
  import argparse
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=2_000_000)
  p.add_argument("--width", type=int, default=2048)
  p.add_argument("--height", type=int, default=1536)
  p.add_argument("--scale", type=float, default=1.2)
  p.add_argument("--group-width", type=int, default=4)
  p.add_argument("--slab-cap", type=int, default=512)
  p.add_argument("--passes", type=int, default=2)
  p.add_argument("--profile-fwd", action="store_true")
  args, _ = p.parse_known_args()
  image_size = (args.width, args.height)
  packed, depth, feats = synthetic_2d(args.n, image_size,
                                      scale_factor=args.scale)
  config = RasterConfig(stream_passes=args.passes)
  gw = args.group_width
  cal = calibrate_stream(packed, depth, feats, image_size, config,
                         group_width=gw, slab_cap=args.slab_cap)
  print("# calibration:", cal)
  m = jax.jit(lambda p_, d_, f_: stream_map(
      p_, d_, f_, image_size, config, num_slabs=cal["num_slabs"],
      strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
      group_width=gw, w_max=cal["w_max"],
      run_cap=cal["run_cap"]))(packed, depth, feats)
  from tpu_splatting.rasterizer.stream_kernels import stream_forward
  _, counts = jax.jit(lambda mm: stream_forward(
      mm, config, with_counts=True))(m)
  total = int(np.asarray(counts)[::8, 0].sum())
  print(f"# ACTIVE SLAB ITERS: {total} (tiles {m.num_tiles}, "
        f"slabs {m.num_slabs})")
  for ab in ("", "skeleton", "no_assemble", "no_mask", "no_alpha"):
    benchmarked(f"fwd ablate={ab or 'none'}",
                lambda mm, ab=ab: stream_forward(mm, config, ablate=ab),
                (m,), iters=3)


def profile_bwd():
  """Ablation profile of the BACKWARD kernel at the headline scene.

  full - no_copyback = tiered RMW copy-back cost; full - no_mask = the
  two rank-mask matmul passes; no_grad isolates the per-point gradient
  chains; skeleton = assemble + copy-back floor."""
  import argparse
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=2_000_000)
  p.add_argument("--width", type=int, default=2048)
  p.add_argument("--height", type=int, default=1536)
  p.add_argument("--scale", type=float, default=1.2)
  p.add_argument("--group-width", type=int, default=8)
  p.add_argument("--slab-cap", type=int, default=512)
  p.add_argument("--passes", type=int, default=1)
  p.add_argument("--profile-bwd", action="store_true")
  args, _ = p.parse_known_args()
  image_size = (args.width, args.height)
  packed, depth, feats = synthetic_2d(args.n, image_size,
                                      scale_factor=args.scale)
  config = RasterConfig(compute_point_heuristic=True,
                        compute_visibility=True,
                        stream_passes=args.passes)
  gw = args.group_width
  cal = calibrate_stream(packed, depth, feats, image_size, config,
                         group_width=gw, slab_cap=args.slab_cap)
  print("# calibration:", cal)
  m = jax.jit(lambda p_, d_, f_: stream_map(
      p_, d_, f_, image_size, config, num_slabs=cal["num_slabs"],
      strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
      group_width=gw, w_max=cal["w_max"],
      run_cap=cal["run_cap"]))(packed, depth, feats)
  from tpu_splatting.rasterizer.stream_kernels import (
      slab_width, stream_backward, stream_forward)
  image_tiled = jax.jit(
      lambda mm: stream_forward(mm, config))(m)
  g_img = jnp.ones_like(image_tiled)
  for ab in ("", "no_copyback", "no_mask", "no_grad", "skeleton"):
    benchmarked(f"bwd ablate={ab or 'none'}",
                lambda mm, it, gi, ab=ab: stream_backward(
                    mm, it, gi, config, cal["run_cap"], ablate=ab),
                (m, image_tiled, g_img), iters=3)


if __name__ == "__main__" and "--profile-fwd" in __import__("sys").argv:
  profile_fwd()
  raise SystemExit(0)
if __name__ == "__main__" and "--profile-bwd" in __import__("sys").argv:
  profile_bwd()
  raise SystemExit(0)
