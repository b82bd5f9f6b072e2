"""Packed-table unpack strategies, round 2 (exp_pack.py's reshape path
is dead: Mosaic rejects ANY sublane<->lane tpu.reshape, including the
(64,128)->(512,16) case).

Candidates for turning a packed (64, 128) block (8 rows x 16 scalars per
sublane row, row-major) into per-row-scalar lane vectors:

  V_a  PERMUTED slots: xt = transpose(packed) (128, 64); P =
       concat_k xt[16k:16k+16] along lanes -> (16, 512) where lane
       c' = 64k + r8 holds row 8*r8 + k.  No further data movement —
       compute proceeds in c' slot order (compositing is
       permutation-invariant; the rank key and validity masks use a
       STATIC fetch_slot(c') iota).  Exact.
  V_b  pltpu.repeat semantics probe (element-repeat vs tile).
  V_c  repeat+select: X8 = repeat rows 8x; rows(512,16) =
       sum_k where(s % 8 == k, X8[:, 16k:16k+16]); transpose.  Exact,
       fetch order, but moves 8x the block.
  V_p  backward lane-permute: one-hot matmul P(16,512) x S(512,512)
       (2-pass split bf16) — precision probe for the backward's
       grows permutation under V_a.
  T2   timing of the viable variants over a 12288-slab grid.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20):
  jax.block_until_ready(fn(*args))
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / iters * 1e3


def make_packed(rows):
  """rows (512, 16) -> packed (64, 128) row-major."""
  return rows.reshape(64, 128)


def perm_cprime(c_cap=512, rpb=8):
  """fetch slot c = 8*r8 + k of permuted lane c' = 64k + r8."""
  cp = np.arange(c_cap)
  k = cp // (c_cap // rpb)
  r8 = cp % (c_cap // rpb)
  return rpb * r8 + k


def v_a():
  def kernel(in_ref, out_ref):
    xt = jnp.transpose(in_ref[...])                   # (128, 64)
    blocks = [xt[16 * k:16 * k + 16, :] for k in range(8)]
    out_ref[...] = jnp.concatenate(blocks, axis=1)    # (16, 512)

  rows = np.random.default_rng(0).random((512, 16)).astype(np.float32)
  try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(make_packed(rows)))
    want = rows.T[:, perm_cprime()]                   # columns in c' order
    ok = np.allclose(np.asarray(out), want)
    print(f"V_a transpose+slice+concat (permuted): {'OK' if ok else 'WRONG'}")
    return ok
  except Exception as e:
    print(f"V_a: FAILED {str(e)[:150]}")
    return False


def v_b():
  def kernel(in_ref, out_ref):
    out_ref[...] = pltpu.repeat(in_ref[...], 2, axis=0)

  x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
  try:
    out = np.asarray(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x)))
    if np.allclose(out, np.repeat(x, 2, axis=0)):
      print("V_b pltpu.repeat: ELEMENT semantics (np.repeat)")
      return "element"
    if np.allclose(out, np.tile(x, (2, 1))):
      print("V_b pltpu.repeat: TILE semantics (np.tile)")
      return "tile"
    print("V_b pltpu.repeat: UNKNOWN semantics")
    return None
  except Exception as e:
    print(f"V_b: FAILED {str(e)[:150]}")
    return None


def v_c(repeat_mode):
  """Exact fetch-order unpack via repeat+select (+known-good transpose)."""
  def kernel(in_ref, out_ref):
    x = in_ref[...]                                   # (64, 128)
    if repeat_mode == "element":
      x8 = pltpu.repeat(x, 8, axis=0)                 # row s = x[s//8]
    else:  # tile: row s = x[s % 64]; need s//8 -> use roll per k? skip
      x8 = jnp.concatenate([x] * 8, axis=0)           # row s = x[s % 64]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 1), 0)
    acc = jnp.zeros((512, 16), jnp.float32)
    for k in range(8):
      if repeat_mode == "element":
        sel = (s_iota % 8) == k                       # x8 row = s//8 ✓
        blk = x8[:, 16 * k:16 * k + 16]
      else:
        # tile mode: want rows[s] = x[s//8, 16k:...] when s%8==k;
        # x8[s] = x[s%64] — use the roll trick: rows s with s%8==k are
        # s = 8*r8+k; x[s//8] = x[r8]; no direct map — unsupported here
        return
      acc = acc + jnp.where(sel, blk, 0.0)
    out_ref[...] = jnp.transpose(acc)                 # (16, 512)

  rows = np.random.default_rng(0).random((512, 16)).astype(np.float32)
  try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(make_packed(rows)))
    ok = np.allclose(np.asarray(out), rows.T)
    print(f"V_c repeat+select (fetch order): {'OK' if ok else 'WRONG'}")
    return ok
  except Exception as e:
    print(f"V_c: FAILED {str(e)[:150]}")
    return False


def v_p():
  """Backward lane permutation c' -> fetch order via 2-pass split one-hot
  matmul: relative error on random f32 gradient-like values."""
  perm = perm_cprime()                       # fetch slot of lane c'
  s_mat = (perm[None, :] == np.arange(512)[:, None]).astype(np.float32)
  # S[c, c'] = 1 iff lane c' holds fetch slot c: out[:, c] = in[:, c'(c)]

  def kernel(in_ref, s_ref, out_ref):
    x = in_ref[...]                                   # (16, 512) c' order
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sb = s_ref[...].astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        hi, sb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(
        lo, sb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = out

  x = (np.random.default_rng(1).standard_normal((16, 512)) *
       10.0 ** np.random.default_rng(2).uniform(-6, 6, (16, 512))
       ).astype(np.float32)
  try:
    out = np.asarray(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(s_mat)))
    want = x[:, perm_cprime().argsort()]  # inverse: out[:, c] = x[:, c'(c)]
    # out[:, c] should equal x[:, lane whose slot == c]
    inv = np.empty(512, np.int64)
    inv[perm_cprime()] = np.arange(512)
    want = x[:, inv]
    rel = np.abs(out - want) / np.maximum(np.abs(want), 1e-30)
    print(f"V_p one-hot 2-pass permute: rel_max={rel.max():.2e} "
          f"rel_p99={np.quantile(rel, 0.99):.2e}")
    return rel.max() < 1e-4
  except Exception as e:
    print(f"V_p: FAILED {str(e)[:150]}")
    return False


def t2_timing(steps=12288):
  """Per-slab cost: today's (512,12) transpose vs V_a vs V_c."""
  def k_today(in_ref, out_ref):
    out_ref[...] = jnp.transpose(in_ref[...])[:, :128]

  def k_va(in_ref, out_ref):
    xt = jnp.transpose(in_ref[...])
    p = jnp.concatenate([xt[16 * k:16 * k + 16, :] for k in range(8)], 1)
    out_ref[...] = p[:12, :128]

  def k_vc(in_ref, out_ref):
    x8 = pltpu.repeat(in_ref[...], 8, axis=0)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (512, 1), 0)
    acc = jnp.zeros((512, 16), jnp.float32)
    for k in range(8):
      acc = acc + jnp.where((s_iota % 8) == k,
                            x8[:, 16 * k:16 * k + 16], 0.0)
    out_ref[...] = jnp.transpose(acc)[:12, :128]

  x_flat = jnp.zeros((steps * 512, 12), jnp.float32)
  x_pack = jnp.zeros((steps * 64, 128), jnp.float32)

  def runner(kern, blk):
    def run(x):
      return pl.pallas_call(
          kern, grid=(steps,),
          in_specs=[pl.BlockSpec(blk, lambda g: (g, 0))],
          out_specs=pl.BlockSpec((12, 128), lambda g: (0, 0)),
          out_shape=jax.ShapeDtypeStruct((12, 128), jnp.float32),
      )(x)
    return jax.jit(run)

  for name, kern, blk, x in (
      ("today (512,12)T", k_today, (512, 12), x_flat),
      ("V_a", k_va, (64, 128), x_pack),
      ("V_c", k_vc, (64, 128), x_pack)):
    try:
      ms = timed(runner(kern, blk), x)
      print(f"T2 {name}: {ms:.2f} ms ({ms / steps * 1e3:.3f} us/slab)")
    except Exception as e:
      print(f"T2 {name}: FAILED {str(e)[:120]}")


def main():
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
  v_a()
  mode = v_b()
  if mode == "element":
    v_c(mode)
  v_p()
  t2_timing()


if __name__ == "__main__":
  main()
