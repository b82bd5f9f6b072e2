"""Mosaic feasibility probes for the data-movement kernels.

T1: dynamic sublane-offset slice of a VMEM value (window select)
T2: contiguous reshape (64,128)->(512,16) inside a kernel
T3: scalar-prefetch-driven double BlockSpec fetch + dynamic window select
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def t1_dynamic_sublane_slice():
  def kernel(d_ref, in_ref, out_ref):
    d = d_ref[0]
    buf = in_ref[...]                       # (256, 16)
    out_ref[...] = jax.lax.dynamic_slice(buf, (d, 0), (128, 16))

  x = jnp.arange(256 * 16, dtype=jnp.float32).reshape(256, 16)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1, grid=(1,),
          in_specs=[pl.BlockSpec((256, 16), lambda k, d: (0, 0))],
          out_specs=pl.BlockSpec((128, 16), lambda k, d: (0, 0))),
      out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32),
  )(jnp.asarray([37], jnp.int32), x)
  ok = np.allclose(np.asarray(out), np.asarray(x)[37:37 + 128])
  print(f"T1 dynamic sublane slice: {'OK' if ok else 'WRONG'}")


def t2_reshape():
  def kernel(in_ref, out_ref):
    out_ref[...] = in_ref[...].reshape(512, 16)

  x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((512, 16), jnp.float32),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
  )(x)
  ok = np.allclose(np.asarray(out), np.asarray(x).reshape(512, 16))
  print(f"T2 contiguous reshape: {'OK' if ok else 'WRONG'}")


def t3_double_blockspec_window():
  g = 128

  def kernel(src_ref, a_ref, b_ref, out_ref):
    k = pl.program_id(0)
    d = src_ref[k] % g
    buf = jnp.concatenate([a_ref[...], b_ref[...]], 0)   # (2g, 16)
    out_ref[...] = jax.lax.dynamic_slice(buf, (d, 0), (g, 16))

  p = 1024
  x = jnp.arange(p * 16, dtype=jnp.float32).reshape(p, 16)
  src = jnp.asarray([5, 200, 513], jnp.int32)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(3,),
      in_specs=[
          pl.BlockSpec((g, 16), lambda k, s: (s[k] // g, 0)),
          pl.BlockSpec((g, 16), lambda k, s: (s[k] // g + 1, 0)),
      ],
      out_specs=pl.BlockSpec((g, 16), lambda k, s: (k, 0)))

  out = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((3 * g, 16), jnp.float32),
  )(src, x, x)
  xs = np.asarray(x)
  expect = np.concatenate([xs[int(s):int(s) + g] for s in src])
  ok = np.allclose(np.asarray(out), expect)
  print(f"T3 double-blockspec window: {'OK' if ok else 'WRONG'}")


def t4_dma_packed_rows():
  """DMA a (64,128) slice at dynamic row offset + per-residue access."""
  def kernel(s_ref, in_ref, out_ref, scratch, sem):
    cp = pltpu.make_async_copy(
        in_ref.at[pl.ds(s_ref[0], 64)], scratch, sem)
    cp.start()
    cp.wait()
    # per-residue lane slices: logical col c of residue p lives at 16p+c
    out_ref[...] = sum(scratch[:, 16 * p:16 * (p + 1)] for p in range(8))

  r = 256
  x = jnp.arange(r * 128, dtype=jnp.float32).reshape(r, 128)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1, grid=(1,),
          in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
          out_specs=pl.BlockSpec((64, 16), lambda k, s: (0, 0)),
          scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32),
                          pltpu.SemaphoreType.DMA]),
      out_shape=jax.ShapeDtypeStruct((64, 16), jnp.float32),
  )(jnp.asarray([19], jnp.int32), x)
  xs = np.asarray(x)[19:19 + 64]
  expect = sum(xs[:, 16 * p:16 * (p + 1)] for p in range(8))
  ok = np.allclose(np.asarray(out), expect)
  print(f"T4 packed-row DMA + residue slices: {'OK' if ok else 'WRONG'}")


if __name__ == "__main__":
  for t in (t1_dynamic_sublane_slice, t2_reshape, t3_double_blockspec_window,
            t4_dma_packed_rows):
    try:
      t()
    except Exception as e:
      print(f"{t.__name__} FAILED: {type(e).__name__}: {str(e)[:200]}")
