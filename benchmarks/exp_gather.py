"""Feasibility + timing experiments for fast row permutation on TPU.

Variants:
  1. XLA row gather (baseline)
  2. lax.sort payload scaling (1 vs many operands)
  3. Pallas multi-pass chunked-table gather (dynamic VMEM indexing)
  4. segment_sum vs gather+window-sum reduction forms
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_splatting.utils.benchmarked import benchmarked


def feasibility_dynamic_gather():
  """Can a Pallas TPU kernel gather rows from a VMEM table by a traced
  index vector?"""

  def kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[...]                     # (B,) i32
    out_ref[...] = table_ref[idx]          # dynamic VMEM gather

  table = jnp.arange(256 * 8, dtype=jnp.float32).reshape(256, 8)
  idx = jnp.asarray(np.random.default_rng(0).integers(0, 256, 128), jnp.int32)
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
  )(idx, table)
  expect = np.asarray(table)[np.asarray(idx)]
  ok = np.allclose(np.asarray(out), expect)
  print(f"dynamic VMEM gather (idx in SMEM): {'OK' if ok else 'WRONG'}")
  return ok


def feasibility_dynamic_gather_vmem_idx():
  def kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[...][:, 0]               # (B,) i32 from VMEM
    out_ref[...] = table_ref[idx]

  table = jnp.arange(256 * 8, dtype=jnp.float32).reshape(256, 8)
  idx = jnp.asarray(np.random.default_rng(0).integers(0, 256, 128), jnp.int32)
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
  )(idx[:, None], table)
  expect = np.asarray(table)[np.asarray(idx)]
  ok = np.allclose(np.asarray(out), expect)
  print(f"dynamic VMEM gather (idx in VMEM): {'OK' if ok else 'WRONG'}")
  return ok


def make_pallas_gather(n_rows: int, chunk_rows: int):
  """out[i] = table[idx[i]] via passes over VMEM-resident table chunks."""

  def kernel(idx_ref, table_ref, out_ref):
    p = pl.program_id(0)
    base = p * chunk_rows
    idx = idx_ref[...][:, 0]
    local = idx - base
    in_chunk = (local >= 0) & (local < chunk_rows)
    rows = table_ref[jnp.clip(local, 0, chunk_rows - 1)]

    @pl.when(p == 0)
    def _():
      out_ref[...] = jnp.where(in_chunk[:, None], rows,
                               jnp.zeros_like(rows))

    @pl.when(p > 0)
    def _():
      out_ref[...] = jnp.where(in_chunk[:, None], rows, out_ref[...])

  def gather(table, idx, block=2048):
    n, r = table.shape
    a = idx.shape[0]
    n_passes = pl.cdiv(n, chunk_rows)
    grid = (n_passes, pl.cdiv(a, block))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), lambda p, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, r), lambda p, j: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, r), lambda p, j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, r), table.dtype),
    )(idx[:, None], table)

  return gather


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n", type=int, default=1_000_000)
  p.add_argument("--a", type=int, default=4_194_304)
  p.add_argument("--cols", type=int, default=16)
  p.add_argument("--skip-feasibility", action="store_true")
  args = p.parse_args()

  if not args.skip_feasibility:
    ok_smem = False
    try:
      ok_smem = feasibility_dynamic_gather()
    except Exception as e:
      print(f"dynamic VMEM gather (idx SMEM) failed: {type(e).__name__}: "
            f"{str(e)[:300]}")
    try:
      feasibility_dynamic_gather_vmem_idx()
    except Exception as e:
      print(f"dynamic VMEM gather (idx VMEM) failed: {type(e).__name__}: "
            f"{str(e)[:300]}")

  n, a, r = args.n, args.a, args.cols
  rng = np.random.default_rng(0)
  table = jnp.asarray(rng.random((n, r)), jnp.float32)
  idx = jnp.asarray(rng.integers(0, n, a), jnp.int32)

  # 1. XLA row gather
  benchmarked("xla_row_gather", lambda t, i: jnp.take(t, i, axis=0),
              (table, idx), iters=10)

  # 2. sort payload scaling
  keys = jnp.asarray(rng.integers(0, 1 << 30, a), jnp.int32)
  pay1 = jnp.asarray(rng.integers(0, n, a), jnp.int32)
  benchmarked("sort_1key_1payload",
              lambda k, v: jax.lax.sort((k, v), num_keys=1), (keys, pay1),
              iters=10)
  pays = tuple(jnp.asarray(rng.random(a), jnp.float32) for _ in range(8))
  benchmarked("sort_1key_8payloads",
              lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1),
              (keys,) + pays, iters=5)

  # 3. Pallas multi-pass gather
  for chunk in (1 << 17, 1 << 18):
    try:
      g = make_pallas_gather(n, chunk)
      out = jax.jit(g)(table, idx)
      ok = np.allclose(np.asarray(out[:4096]),
                       np.asarray(table)[np.asarray(idx[:4096])])
      print(f"pallas_gather chunk={chunk}: correct={ok}")
      benchmarked(f"pallas_gather chunk={chunk}", g, (table, idx), iters=10)
    except Exception as e:
      print(f"pallas_gather chunk={chunk} failed: {type(e).__name__}: "
            f"{str(e)[:300]}")

  # 4. reduction forms
  vals = jnp.asarray(rng.random((a, r)), jnp.float32)
  seg = jnp.asarray(rng.integers(0, n + 1, a), jnp.int32)
  benchmarked("segment_sum", lambda v, s: jax.ops.segment_sum(
      v, s, num_segments=n + 1)[:n], (vals, seg), iters=5)

  c = n * 9
  cand = jnp.asarray(rng.integers(0, a + 1, c), jnp.int32)
  def window_reduce(v, ci):
    ext = jnp.concatenate([v, jnp.zeros((1, r), v.dtype)], 0)
    return ext[ci].reshape(n, 9, r).sum(1)
  benchmarked("xla_gather_window_reduce", window_reduce, (vals, cand),
              iters=5)


if __name__ == "__main__":
  main()
