"""Isolate the rasterizer kernel's fixed per-chunk cost vs compute.

Three probes on the real chip:
1. saturate_threshold sweep — how much does the chunk skip actually save?
   (0.99 freezes aggressively; ~1.0 never freezes)
2. a no-compute variant of the forward pipeline (same grid/BlockSpecs/
   window select, body writes a constant) — the pipeline+DMA floor.
3. chunk_size sweep — grid-step overhead vs scan depth.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_splatting import RasterConfig
from tpu_splatting.mapper.tile_mapper import map_to_tiles, tile_shape
from tpu_splatting.rasterizer import kernels
from tpu_splatting.utils.benchmarked import benchmarked
from benchmarks.bench_components import synthetic_2d


def _floor_kernel(src_ref, cnt_ref, ct_ref, a_blk_ref, b_blk_ref,
                  img_ref, win_ref, *, g, pix, f, num_tiles):
  k = pl.program_id(0)
  t = ct_ref[k]
  is_dummy = t >= num_tiles

  @pl.when(jnp.logical_not(is_dummy))
  def _():
    rows = kernels._window_rows(a_blk_ref, b_blk_ref, win_ref,
                                src_ref[k] % g, g)
    img_ref[0, 0, :] = rows[0, 0] * jnp.ones((pix,), rows.dtype)


def floor_forward(sorted_rows, chunk_src, chunk_cnt, chunk_to_tile,
                  config, num_tiles):
  width = sorted_rows.shape[1]
  g = config.chunk_size
  pix = config.tile_area
  k_chunks = chunk_to_tile.shape[0]
  dtype = sorted_rows.dtype
  kernel = functools.partial(_floor_kernel, g=g, pix=pix, f=width - 7,
                             num_tiles=num_tiles)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(k_chunks,),
      in_specs=[
          pl.BlockSpec((g, width), lambda k, src, cnt, ct: (src[k] // g, 0)),
          pl.BlockSpec((g, width),
                       lambda k, src, cnt, ct: (src[k] // g + 1, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, 1, pix), lambda k, src, cnt, ct: (ct[k], 0, 0)),
      ],
      scratch_shapes=[pltpu.VMEM((2 * g, width), dtype)],
  )
  (out,) = pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=[jax.ShapeDtypeStruct((num_tiles + 1, 1, pix), dtype)],
  )(chunk_src, chunk_cnt, chunk_to_tile, sorted_rows, sorted_rows)
  return out


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--max-overlaps", type=int, default=4_450_000)
  p.add_argument("--iters", type=int, default=5)
  args = p.parse_args()

  image_size = (1024, 768)
  packed, depth, feats = synthetic_2d(args.n, image_size, scale_factor=4.0)
  base = RasterConfig(chunk_size=128)
  tw, th = tile_shape(image_size, base.tile_size)
  num_tiles = tw * th
  it = args.iters

  mapping = jax.jit(lambda p_, d, f_: map_to_tiles(
      p_, d, image_size, base, max_overlaps=args.max_overlaps,
      features=f_))(packed, depth, feats)
  rows, src, cnt = (mapping.sorted_payload, mapping.chunk_src,
                    mapping.chunk_cnt)

  # 1. saturation sweep
  for sat in (0.99, 0.999, 0.9999, 0.99999999):
    cfg = dataclasses.replace(base, saturate_threshold=sat)
    benchmarked(f"fwd sat={sat}", lambda r, s_, c_, ct, cfg=cfg:
                kernels.forward(r, s_, c_, ct, cfg, num_tiles, tw,
                                with_vis=False),
                (rows, src, cnt, mapping.chunk_to_tile), iters=it)

  # 2. pipeline floor (no compute)
  benchmarked("fwd FLOOR (no compute)", lambda r, s_, c_, ct:
              floor_forward(r, s_, c_, ct, base, num_tiles),
              (rows, src, cnt, mapping.chunk_to_tile), iters=it)

  # 3. chunk-size sweep (remap per size)
  for g in (64, 256):
    cfg = dataclasses.replace(base, chunk_size=g)
    m = jax.jit(lambda p_, d, f_, cfg=cfg: map_to_tiles(
        p_, d, image_size, cfg, max_overlaps=args.max_overlaps,
        features=f_))(packed, depth, feats)
    benchmarked(f"fwd chunk={g}", lambda r, s_, c_, ct, cfg=cfg:
                kernels.forward(r, s_, c_, ct, cfg, num_tiles, tw,
                                with_vis=False),
                (m.sorted_payload, m.chunk_src, m.chunk_cnt,
                 m.chunk_to_tile), iters=it)


if __name__ == "__main__":
  main()
