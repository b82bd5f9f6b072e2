"""Dissect the backward reduction path cost on the real chip.

The r2 profile shows sort(23.6) + segsum(40.3) but the composite
reduce (sort_reduce) at 148.9 ms on an 8.8M domain — ~85 ms of glue.
This experiment isolates: column extraction, stacking, packing, the
segment-sum kernel's block-size sensitivity, and bf16-packed variants.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting.rasterizer.layout import segment_sum_sorted
from tpu_splatting.utils.benchmarked import benchmarked


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--a", type=int, default=4_400_000)
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--c", type=int, default=12)
  p.add_argument("--iters", type=int, default=10)
  args = p.parse_args()

  a, n, c = args.a, args.n, args.c
  it = args.iters
  rng = np.random.default_rng(0)

  gout = jnp.asarray(rng.standard_normal((a, c)).astype(np.float32))
  pid = jnp.asarray(np.sort(rng.integers(0, n, a)).astype(np.int32))
  pid_unsorted = jnp.asarray(rng.integers(0, n, a).astype(np.int32))

  # 1. column extraction alone (force materialisation via per-col sum)
  benchmarked("cols_extract", lambda g: jnp.stack(
      [g[:, i].sum() for i in range(c)]), (gout,), iters=it)

  # 2. full sort with columns sliced from (A, C)
  benchmarked("sort_from_matrix", lambda g, p_: jax.lax.sort(
      (p_,) + tuple(g[:, i] for i in range(c)), num_keys=1)[0],
      (gout, pid_unsorted), iters=it)

  # 3. sort from pre-split columns
  cols = tuple(jnp.asarray(np.ascontiguousarray(
      np.asarray(gout)[:, i])) for i in range(c))
  benchmarked("sort_from_cols", lambda p_, *cs: jax.lax.sort(
      (p_,) + cs, num_keys=1)[0], (pid_unsorted,) + cols, iters=it)

  # 4. stack sorted columns -> (A, C)
  benchmarked("stack_cols", lambda *cs: jnp.stack(cs, -1), cols, iters=it)

  # 5. pack into super-rows (the segment_sum preamble), via stacked input
  def pack(g, ids):
    idcol = jax.lax.bitcast_convert_type(ids, jnp.float32)[:, None]
    m_pad = ((a + 1023) // 1024 + 1) * 1024
    padn = m_pad - a
    logical = jnp.concatenate(
        [g, jnp.zeros((a, 16 - 1 - c), g.dtype), idcol], -1)
    sent = jnp.zeros((padn, 16), g.dtype)
    return jnp.concatenate([logical, sent], 0).reshape(m_pad // 8, 128)
  benchmarked("pack_superrows", pack, (gout, pid), iters=it)

  # 6. segment-sum kernel at several block sizes
  for b in (128, 256, 512, 1024):
    benchmarked(f"segsum_b{b}", lambda g, i_: segment_sum_sorted(
        g, i_, n, block=b), (gout, pid), iters=it)

  # 7. end-to-end reduce as in production
  from tpu_splatting.rasterizer.function import reduce_chunked_to_points
  benchmarked("reduce_e2e", lambda g, p_: reduce_chunked_to_points(
      g, p_, n), (gout, pid_unsorted), iters=it)

  # 7b. composite bisect: sort+stack, then sort+stack+pack, then full chain
  def sort_stack(g, p_):
    ops = jax.lax.sort((p_,) + tuple(g[:, i] for i in range(c)), num_keys=1)
    return jnp.stack(ops[1:], -1), ops[0]
  benchmarked("chain_sort_stack", lambda g, p_: sort_stack(g, p_)[0],
              (gout, pid_unsorted), iters=it)

  def sort_stack_pack(g, p_):
    rows, ids = sort_stack(g, p_)
    return pack(rows, ids)
  benchmarked("chain_sort_stack_pack", sort_stack_pack,
              (gout, pid_unsorted), iters=it)

  def chain_full(g, p_):
    rows, ids = sort_stack(g, p_)
    return segment_sum_sorted(rows, ids, n)
  benchmarked("chain_full", chain_full, (gout, pid_unsorted), iters=it)

  # 7c. segsum fed data-dependent (sorted in-jit) inputs
  def presorted_then_sum(rows, ids):
    return segment_sum_sorted(rows + 0.0, ids, n)
  rows_s = jnp.asarray(np.asarray(
      jax.jit(lambda g, p_: sort_stack(g, p_)[0])(gout, pid_unsorted)))
  benchmarked("segsum_again_b512", presorted_then_sum, (rows_s, pid),
              iters=it)

  # 8. bf16-packed sort: pairs of bf16 ride as single f32-bitpattern ops
  def pack_bf16(g):
    gb = g.astype(jnp.bfloat16)
    pairs = []
    for i in range(0, c, 2):
      lo = gb[:, i].view(jnp.uint16).astype(jnp.uint32)
      hi = gb[:, i + 1].view(jnp.uint16).astype(jnp.uint32) << 16
      pairs.append((lo | hi).view(jnp.float32))
    return tuple(pairs)
  packed_cols = jax.jit(pack_bf16)(gout)
  benchmarked("sort_bf16_packed", lambda p_, *cs: jax.lax.sort(
      (p_,) + cs, num_keys=1)[0], (pid_unsorted,) + packed_cols, iters=it)
  benchmarked("pack_bf16_cost", lambda g: pack_bf16(g)[0], (gout,), iters=it)


if __name__ == "__main__":
  main()
