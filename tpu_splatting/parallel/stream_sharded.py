"""Band-sharded single-camera stream rasterization over a device mesh.

The stream group grid is band-major, so sharding ALONG Y is a contiguous
split of every per-group array: shard d owns tile bands
[d*th_local, (d+1)*th_local).  The home-sorted table is replicated (its
strip fetches reach one band beyond the shard, and at ~50 MB/2M splats
replication is far cheaper than halo-exchanging row windows every
frame); descriptors, strip blocks, the tiled image, and the backward's
gradient-slab blocks are all band-sharded.

Forward: zero collectives — each shard renders its bands bit-identically
to the single-device kernel (the ``band0`` scalar gives kernels their
absolute band index).

Backward: gradient-slab blocks stay shard-local; the 9-slab merge needs
the NEIGHBOURING band's blocks at shard edges, exchanged with two
``ppermute``s (one group-row each way; missing peers arrive as zeros,
which is exactly the out-of-image masking the unsharded merge applies).
The merged home-major columns are ``all_gather``ed (13 x R x 4 bytes)
and the cheap stage-2 sorts run replicated, so per-point gradients come
out replicated with no psum.

This is the scale-out path for the reference's actual workload — ONE
large frame — complementing camera-batch data parallelism
(data_parallel.py).  The reference is single-GPU (SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data_types import RasterConfig
from ..rasterizer.stream import StreamMapping
from ..rasterizer.stream_kernels import (merge_grad_slabs, slab_width,
                                         stream_backward, stream_forward)
from ..rasterizer.stream_function import reduce_stage2


def _local_mapping(mapping: StreamMapping, desc, strip_blk, table,
                   run_starts, overflow, th_local: int) -> StreamMapping:
  # grad_src/dup_src/dup_pid are only read by the replicated stage-2
  # gathers OUTSIDE the shard body — blank them here so the closed-over
  # host arrays never leak into the shard_map trace
  zero_i = jnp.zeros((0,), jnp.int32)
  return dataclasses.replace(
      mapping, desc=desc, strip_blk=strip_blk, table=table,
      run_starts=run_starts, num_overflow=overflow[0],
      overflow=overflow[1], grad_src=zero_i, dup_src=zero_i,
      dup_pid=zero_i, pid_order=zero_i, tiles_high=th_local,
      num_tiles=mapping.tiles_wide * th_local)


def band_sharded_forward(mapping: StreamMapping, config: RasterConfig,
                         mesh: Mesh, axis_name: str = "y"):
  """Forward render with the group grid band-sharded over ``mesh``.

  Returns image_tiled (T, F+1, PIX) sharded on its first axis; values
  are bit-identical to the single-device ``stream_forward`` (each tile
  is composited by exactly one shard from the replicated table)."""
  n_dev = mesh.shape[axis_name]
  th = mapping.tiles_high
  assert th % n_dev == 0, (th, n_dev)
  th_local = th // n_dev

  def per_shard(desc, strip_blk, table, run_starts, overflow):
    d = jax.lax.axis_index(axis_name)
    lm = _local_mapping(mapping, desc, strip_blk, table, run_starts,
                        overflow, th_local)
    return stream_forward(lm, config, band0=d * th_local)

  f = shard_map(
      per_shard, mesh=mesh,
      in_specs=(P(axis_name), P(axis_name), P(), P(), (P(), P())),
      out_specs=P(axis_name),
      check_vma=False)
  return f(mapping.desc, mapping.strip_blk, mapping.table,
           mapping.run_starts, (mapping.num_overflow, mapping.overflow))


def band_sharded_grad(mapping: StreamMapping, g_image_tiled,
                      config: RasterConfig, mesh: Mesh,
                      axis_name: str = "y"):
  """Forward + backward with band-sharded kernels.

  ``g_image_tiled`` (T, F+1, PIX): the loss cotangent in tile layout,
  sharded (or shardable) on its first axis.  Returns
  (image_tiled sharded, per-point gradient columns replicated —
  ``slabw`` 1D (n,) arrays in the caller's point order)."""
  n_dev = mesh.shape[axis_name]
  th = mapping.tiles_high
  assert th % n_dev == 0, (th, n_dev)
  th_local = th // n_dev
  groups_x = mapping.tiles_wide // mapping.group_width
  f = mapping.feature_size
  slabw = slab_width(config, f)
  rc = mapping.run_cap

  def per_shard(desc, strip_blk, table, run_starts, overflow, gimg):
    d = jax.lax.axis_index(axis_name)
    band0 = d * th_local
    lm = _local_mapping(mapping, desc, strip_blk, table, run_starts,
                        overflow, th_local)
    from ..rasterizer.stream_kernels import asm_feasible
    if config.stream_share_asm and asm_feasible(lm, config):
      img, asm = stream_forward(lm, config, band0=band0, with_asm=True)
    else:
      img, asm = stream_forward(lm, config, band0=band0), None
    gout = stream_backward(lm, img, gimg, config, rc, band0=band0,
                           asm=asm)

    # halo exchange: shard edges need the adjacent band's slab blocks.
    # ppermute delivers zeros to shards with no peer — exactly the
    # out-of-image band masking the unsharded merge applies.
    top = gout[:groups_x]
    bot = gout[gout.shape[0] - groups_x:]
    down = [(i, i + 1) for i in range(n_dev - 1)]   # bot_d -> halo_{d+1}
    up = [(i, i - 1) for i in range(1, n_dev)]      # top_d -> halo_{d-1}
    halo_above = jax.lax.ppermute(bot, axis_name, down)
    halo_below = jax.lax.ppermute(top, axis_name, up)
    gout_ext = jnp.concatenate([halo_above, gout, halo_below], 0)

    cols_local = merge_grad_slabs(gout_ext, lm, rc, slabw, halo=True)
    cols = [jax.lax.all_gather(c, axis_name, tiled=True)
            for c in cols_local]
    return img, tuple(cols)

  fn = shard_map(
      per_shard, mesh=mesh,
      in_specs=(P(axis_name), P(axis_name), P(), P(), (P(), P()),
                P(axis_name)),
      out_specs=(P(axis_name), tuple(P() for _ in range(slabw))),
      check_vma=False)
  img, acc_cols = fn(mapping.desc, mapping.strip_blk, mapping.table,
                     mapping.run_starts,
                     (mapping.num_overflow, mapping.overflow),
                     g_image_tiled)
  cols = reduce_stage2(list(acc_cols), mapping, rc)
  return img, cols
