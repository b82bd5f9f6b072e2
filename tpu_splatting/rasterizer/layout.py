"""Pallas data-movement kernels: chunk window-copy and sorted segment-sum.

TPU has no efficient random row gather/scatter (XLA's lowering costs ~7 ns
per row, ~600x off HBM bandwidth, and Mosaic has no dynamic vector
indexing).  What the hardware DOES do at bandwidth is block transfers at
dynamic offsets — so all data movement in this library is structured as
contiguous windows.  Mosaic constraints shape the implementations (probed
in benchmarks/exp_mosaic.py):

* manual DMA slices must be lane-exact: a (rows, 10) f32 slice is illegal,
  a (rows, 128) slice is fine -> narrow rows are packed 8-per-128-lane
  "super-row" and accessed as per-residue lane slices (no reshape, which
  Mosaic also rejects);
* ``dynamic_slice`` on values is unsupported, but dynamic starts on REF
  indexing (``ref[pl.ds(d, n)]``) work -> dynamic window selects go through
  VMEM scratch.

The two kernels:

* ``window_copy``: lay the tile-sorted overlap rows out chunk-aligned.
  Each output chunk is a contiguous window of the sorted domain; the
  pipeline fetches the two g-aligned blocks covering it (scalar-prefetch
  index maps) and the kernel selects the window with a dynamic-start
  scratch read.  Replaces the reference's per-overlap gather
  (/root/reference/taichi_splatting/rasterizer/forward.py:60-79 stages
  points into shared memory the same way, block by block).

* ``segment_sum_sorted``: reduce id-sorted rows per id.  Replaces the
  reference's warp-reduce + global atomics
  (rasterizer/backward.py:199-224): the grid iterates OUTPUT id blocks;
  each block's contributing input rows are one contiguous window (ids are
  sorted), streamed as packed super-rows with double-buffered DMA and
  reduced with per-residue one-hot matmuls on the MXU — no atomics, no
  scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.interpret import use_interpret




# ---------------------------------------------------------------------------
# window_copy
# ---------------------------------------------------------------------------


def _window_copy_kernel(src_ref, cnt_ref, a_ref, b_ref, out_ref, scratch,
                        *, g: int):
  k = pl.program_id(0)
  d = src_ref[k] % g
  scratch[0:g] = a_ref[...]
  scratch[g:2 * g] = b_ref[...]
  rows = scratch[pl.ds(d, g), :]
  r = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
  out_ref[...] = jnp.where(r < cnt_ref[k], rows, jnp.zeros_like(rows))


def window_copy(rows: jnp.ndarray, chunk_src: jnp.ndarray,
                chunk_cnt: jnp.ndarray, g: int) -> jnp.ndarray:
  """out[k*g + r] = rows[chunk_src[k] + r] if r < chunk_cnt[k] else 0.

  ``rows`` must have at least ``(max(chunk_src) // g + 2) * g`` rows (the
  mapper pads its sorted buffers with two chunks of slack).
  """
  k_chunks = chunk_src.shape[0]
  c = rows.shape[1]

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k_chunks,),
      in_specs=[
          pl.BlockSpec((g, c), lambda k, src, cnt: (src[k] // g, 0)),
          pl.BlockSpec((g, c), lambda k, src, cnt: (src[k] // g + 1, 0)),
      ],
      out_specs=pl.BlockSpec((g, c), lambda k, src, cnt: (k, 0)),
      scratch_shapes=[pltpu.VMEM((2 * g, c), rows.dtype)],
  )

  return pl.pallas_call(
      functools.partial(_window_copy_kernel, g=g),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((k_chunks * g, c), rows.dtype),
      interpret=use_interpret(),
  )(chunk_src, chunk_cnt, rows, rows)


# ---------------------------------------------------------------------------
# segment_sum_sorted
# ---------------------------------------------------------------------------

_LANES = 128
_PACK_COLS = 16                  # logical row width (last col: bitcast ids)
_PACK_ROWS = _LANES // _PACK_COLS


def _segment_sum_kernel(bs_ref, packed_ref, out_ref, scratch, sems,
                        *, b: int, sub: int, c: int, exact: bool):
  m = pl.program_id(0)
  base = m * b
  s_al = (bs_ref[m] // _PACK_ROWS) * _PACK_ROWS   # 8-row aligned window
  e = bs_ref[m + 1]
  nsub = pl.cdiv(e - s_al, jnp.int32(sub))
  subsr = sub // _PACK_ROWS                        # super-rows per sub-block

  out_ref[...] = jnp.zeros_like(out_ref)

  def dma(slot, j):
    return pltpu.make_async_copy(
        packed_ref.at[pl.ds(s_al // _PACK_ROWS + j * subsr, subsr)],
        scratch.at[slot], sems.at[slot])

  @pl.when(nsub > 0)
  def _():
    dma(0, 0).start()

    def body(j, _):
      slot = j % 2

      @pl.when(j + 1 < nsub)
      def _():
        dma((j + 1) % 2, j + 1).start()

      dma(slot, j).wait()

      acc = jnp.zeros((b, _PACK_COLS), out_ref.dtype)
      for p in range(_PACK_ROWS):
        cols = scratch[slot][:, _PACK_COLS * p:_PACK_COLS * (p + 1)]
        idcol = cols[:, _PACK_COLS - 1]
        # ids ride BY VALUE (exact in f32 below 2^24, asserted by the
        # caller; bitcast storage flushes denormal patterns on TPU)
        ids = idcol.astype(jnp.int32) - base
        # zero out-of-range rows BEFORE the matmul: 0 * NaN = NaN, so a
        # NaN in a sentinel/padding row would otherwise poison the whole
        # block through the one-hot contraction
        in_range = ((ids >= 0) & (ids < b))[:, None]
        vals = jnp.where(in_range, cols, jnp.zeros_like(cols))
        out_rows = jax.lax.broadcasted_iota(jnp.int32, (b, subsr), 0)
        oh = (out_rows == ids[None, :])
        if exact:
          # exact path (CPU interpret mode: oracle tests, f64 gradcheck)
          acc += jax.lax.dot_general(
              oh.astype(vals.dtype), vals,
              dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=vals.dtype)
        else:
          # f32 rows: bf16 one-hot contraction with f32 accumulation
          # (measured 1.55x on the MXU at this shape; per-contribution
          # rounding is bf16, the running sum stays f32)
          acc += jax.lax.dot_general(
              oh.astype(jnp.bfloat16), vals.astype(jnp.bfloat16),
              dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32)
      out_ref[...] += acc
      return 0

    jax.lax.fori_loop(0, nsub, body, 0)


def segment_sum_sorted(rows: jnp.ndarray, ids: jnp.ndarray,
                       num_segments: int, block: int = 512,
                       sub: int = 1024) -> jnp.ndarray:
  """Sum rows by id, ids sorted ascending; returns (num_segments, C).

  Rows with id >= num_segments are dropped (sentinel padding).  C must be
  at most 15 (rows are packed 8-per-128-lane super-row with the bitcast id
  in the last column).
  """
  m, c = rows.shape
  assert c <= _PACK_COLS - 1, f"too many columns for packed reduce: {c}"
  nb = pl.cdiv(num_segments, block)

  # pack [rows | 0-pad | ids] into (m_pad/8, 128) super-rows; ids ride BY
  # VALUE in the row dtype — exact in f32 below 2^24 (bitcast storage
  # would flush denormal id bit patterns to zero on TPU)
  assert num_segments < (1 << 24) - 1, "segment id exceeds f32 exact range"
  m_pad = ((m + sub - 1) // sub + 1) * sub   # sub-block slack for DMA
  pad = m_pad - m
  idcol = ids.astype(rows.dtype)[:, None]
  sent_val = jnp.asarray((1 << 24) - 1, rows.dtype)
  logical = jnp.concatenate(
      [rows, jnp.zeros((m, _PACK_COLS - 1 - c), rows.dtype), idcol], -1)
  sentinel = jnp.zeros((pad, _PACK_COLS), rows.dtype).at[:, -1].set(sent_val)
  packed = jnp.concatenate([logical, sentinel], 0).reshape(
      m_pad // _PACK_ROWS, _LANES)

  # block m's input window = rows with id in [m*block, (m+1)*block)
  edges = jnp.arange(nb + 1, dtype=jnp.int32) * block
  block_starts = jnp.searchsorted(ids, edges, side="left").astype(jnp.int32)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(nb,),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((block, _PACK_COLS), lambda m_, bs: (m_, 0)),
      scratch_shapes=[pltpu.VMEM((2, sub // _PACK_ROWS, _LANES), rows.dtype),
                      pltpu.SemaphoreType.DMA((2,))],
  )

  out = pl.pallas_call(
      functools.partial(_segment_sum_kernel, b=block, sub=sub, c=c,
                        exact=rows.dtype != jnp.float32 or use_interpret()),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((nb * block, _PACK_COLS), rows.dtype),
      interpret=use_interpret(),
  )(block_starts, packed)

  return out[:num_segments, :c]
