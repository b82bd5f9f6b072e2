"""How fast does XLA gather move WIDE rows on the TPU?

The stream kernels assemble each (tile, slab) working set with ~15 tiered
window copies (measured ~32 ms per kernel pass at the 2M headline).  If an
XLA row gather over the PACKED (N/rpb, 128) table moves whole 128-lane
sublane rows at near-bandwidth (rather than the ~1 element/cycle measured
for narrow gathers), the window-copy machinery can be replaced by one
map-time gather producing a dense pre-assembled slab table that forward
AND backward read contiguously.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/exp_rowgather.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splatting.utils.benchmarked import benchmarked


def main():
  rng = np.random.default_rng(0)
  for n, a, cols in (
      (500_000, 1_600_000, 128),   # packed table rows, uniform-scene asm
      (500_000, 1_600_000, 32),    # unpacked-width comparison
      (1_000_000, 6_000_000, 128), # heavy-scene scale
      (2_000_000, 2_000_000, 16),  # row-major (N, 16) f32 variant
  ):
    table = jnp.asarray(rng.random((n, cols)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, a), jnp.int32)
    ms = benchmarked(f"row_gather n={n} a={a} cols={cols}",
                     lambda t, i: jnp.take(t, i, axis=0), (table, idx),
                     iters=5)
    gb = a * cols * 4 / 1e9
    print(f"  -> {gb / (ms / 1e3):.1f} GB/s useful "
          f"({a / (ms * 1e6):.2f} rows/ns)")

  # mostly-sequential indices (windowed assembly is locally contiguous):
  n, a, cols = 500_000, 1_600_000, 128
  table = jnp.asarray(rng.random((n, cols)), jnp.float32)
  base = np.sort(rng.integers(0, n - 64, a // 32))
  idx_seq = (base[:, None] + np.arange(32)[None, :] * 2).reshape(-1)
  idx_seq = jnp.asarray(np.clip(idx_seq, 0, n - 1), jnp.int32)
  ms = benchmarked(f"row_gather seq-ish n={n} a={a} cols={cols}",
                   lambda t, i: jnp.take(t, i, axis=0), (table, idx_seq),
                   iters=5)
  print(f"  -> {a * cols * 4 / 1e9 / (ms / 1e3):.1f} GB/s useful")


if __name__ == "__main__":
  main()
