"""Packed-8 table layout probes (round 4).

The stream table is (N, 12) f32; the TPU's (8, 128) tiling pads the 12
lanes to 128, so every strip fetch moves ~10.7x the useful bytes
(~19 GB/frame at gw=2 on the uniform headline scene — ~24 ms of pure HBM
traffic in EACH of forward and backward).  Packing 8 consecutive rows
per sublane row ((N/8, 96), row-major within the sublane) cuts that to
1.33x, at the cost of (a) quantizing window copies to 8-row granularity
and (b) one unpack relayout per (tile, slab) in the kernel.

Probes (run on the real chip):
  U1  unpack correctness: (64, 96) -> (512, 12) contiguous reshape ->
      (12, 512) transpose inside a kernel.
  U2  unpack direct: reshape(64,12,8)/transpose variants (col-major pack).
  T1  timing: per-slab cost of [transpose-only (today), reshape+transpose
      (packed row-major)] over a 12288-step grid.
  F1  fetch bandwidth: stream a 2M-row table through a grid as
      (1024, 12) blocks vs (128, 96) packed blocks; ms per pass.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20):
  fn(*args)[0].block_until_ready() if isinstance(fn(*args), (tuple, list)) \
      else jax.block_until_ready(fn(*args))
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters * 1e3


def u1_unpack_rowmajor():
  """(64, 128) packed row-major (w_pad=16) -> (16, 512): contiguous
  reshape + transpose — T2-proven shapes ((64,128)->(512,16))."""
  def kernel(in_ref, out_ref):
    rows = in_ref[...].reshape(512, 16)
    out_ref[...] = jnp.transpose(rows)

  x = np.random.default_rng(0).random((512, 16)).astype(np.float32)
  xp = jnp.asarray(x.reshape(64, 128))
  try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp)
    ok = np.allclose(np.asarray(out), x.T)
    print(f"U1 w_pad16 reshape+transpose: {'OK' if ok else 'WRONG'}")
    return ok
  except Exception as e:
    print(f"U1 w_pad16 reshape+transpose: FAILED {str(e)[:200]}")
    return False


def u1b_unpack_rowmajor_w11():
  """Same with width 11 (88 lanes): 7 gaussian + 3 feats + rank."""
  def kernel(in_ref, out_ref):
    rows = in_ref[...].reshape(512, 11)
    out_ref[...] = jnp.transpose(rows)

  x = np.random.default_rng(0).random((512, 11)).astype(np.float32)
  xp = jnp.asarray(x.reshape(64, 88))
  try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((11, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(xp)
    ok = np.allclose(np.asarray(out), x.T)
    print(f"U1b rowmajor w=11: {'OK' if ok else 'WRONG'}")
    return ok
  except Exception as e:
    print(f"U1b rowmajor w=11: FAILED {str(e)[:200]}")
    return False


def u2_unpack_colmajor():
  """(64, 96) packed col-major (lane = w*8 + k) -> (12, 512) via
  reshape(64,12,8) -> transpose(1,0,2) -> reshape."""
  def kernel(in_ref, out_ref):
    x = in_ref[...].reshape(64, 12, 8)
    out_ref[...] = jnp.transpose(x, (1, 0, 2)).reshape(12, 512)

  rows = np.random.default_rng(0).random((512, 12)).astype(np.float32)
  xp = rows.reshape(64, 8, 12).transpose(0, 2, 1).reshape(64, 96)
  try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((12, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(xp))
    ok = np.allclose(np.asarray(out), rows.T)
    print(f"U2 colmajor 3d-transpose: {'OK' if ok else 'WRONG'}")
    return ok
  except Exception as e:
    print(f"U2 colmajor 3d-transpose: FAILED {str(e)[:200]}")
    return False


def t1_timing(steps=12288):
  """Per-slab relayout cost over a full-frame-sized grid: transpose only
  (today) vs reshape+transpose (packed).  A dummy dot keeps the grid from
  being memory-trivial."""
  def k_transpose(in_ref, out_ref):
    rows_t = jnp.transpose(in_ref[...])               # (12, 512)
    out_ref[...] = rows_t[:, :128]

  def k_unpack(in_ref, out_ref):
    rows_t = jnp.transpose(in_ref[...].reshape(512, 16))
    out_ref[...] = rows_t[:12, :128]

  x_flat = jnp.zeros((steps * 512, 12), jnp.float32)
  x_pack = jnp.zeros((steps * 64, 128), jnp.float32)

  def run_t(x):
    return pl.pallas_call(
        k_transpose, grid=(steps,),
        in_specs=[pl.BlockSpec((512, 12), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((12, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((12, 128), jnp.float32),
    )(x)

  def run_u(x):
    return pl.pallas_call(
        k_unpack, grid=(steps,),
        in_specs=[pl.BlockSpec((64, 128), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((12, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((12, 128), jnp.float32),
    )(x)

  jt = jax.jit(run_t)
  ju = jax.jit(run_u)
  ms_t = timed(jt, x_flat)
  ms_u = timed(ju, x_pack)
  print(f"T1 {steps} slabs: transpose-only {ms_t:.2f} ms "
        f"({ms_t / steps * 1e3:.3f} us/slab), unpack+transpose "
        f"{ms_u:.2f} ms ({ms_u / steps * 1e3:.3f} us/slab)")
  print(f"   NOTE transpose-only also fetched (512,12)->128-lane padded "
        f"blocks: {steps * 512 * 128 * 4 / 1e9:.2f} GB vs packed "
        f"{steps * 64 * 128 * 4 / 1e9:.2f} GB")


def f1_fetch(n=2_000_000, s_cap=1024):
  """Strip-fetch bandwidth: grid streams the whole table once; flat
  (s_cap, 12) blocks vs packed (s_cap/8, 96) blocks."""
  g_flat = n // s_cap

  def k_any(in_ref, out_ref):
    out_ref[...] += jnp.sum(in_ref[...], 0, keepdims=True)

  def init_out(shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)

  def run_flat(x):
    return pl.pallas_call(
        k_any, grid=(g_flat,),
        in_specs=[pl.BlockSpec((s_cap, 12), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((1, 12), lambda g: (0, 0)),
        out_shape=init_out((1, 12)),
    )(x)

  def run_pack(x):
    return pl.pallas_call(
        k_any, grid=(g_flat,),
        in_specs=[pl.BlockSpec((s_cap // 8, 128), lambda g: (g, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda g: (0, 0)),
        out_shape=init_out((1, 128)),
    )(x)

  x_flat = jnp.zeros((n, 12), jnp.float32)
  x_pack = jnp.zeros((n // 8, 128), jnp.float32)
  ms_f = timed(jax.jit(run_flat), x_flat)
  ms_p = timed(jax.jit(run_pack), x_pack)
  gb_f = g_flat * s_cap * 128 * 4 / 1e9
  gb_p = g_flat * (s_cap // 8) * 128 * 4 / 1e9
  print(f"F1 one table pass ({g_flat} blocks): flat {ms_f:.2f} ms "
        f"({gb_f / ms_f * 1e3:.0f} GB/s of {gb_f:.2f} GB), packed "
        f"{ms_p:.2f} ms ({gb_p / ms_p * 1e3:.0f} GB/s of {gb_p:.2f} GB)")


def main():
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
  print(f"devices: {jax.devices()}")
  u1_unpack_rowmajor()
  u1b_unpack_rowmajor_w11()
  u2_unpack_colmajor()
  t1_timing()
  f1_fetch()


if __name__ == "__main__":
  main()
