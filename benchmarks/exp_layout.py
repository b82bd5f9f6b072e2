"""Measure the HBM cost of narrow / ragged array shapes on the chip.

Informs the projection/SH glue redesign (VERDICT r5 #2): how much do
(N, 3) / (N, 4) / (N, 7) / (N, 3, 16) arrays cost to read/write through a
jit boundary vs lane-dense equivalents ((N,) columns, (N, 48), packed
(N/4, 128))?  Each workload is sum(x * 1.0001) — one full read, scalar
output — or y = x * 1.0001 — read + write.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_layout.py
"""

from __future__ import annotations

import numpy as np

N = 2_000_000


def main():
  import jax
  import jax.numpy as jnp
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
  from tpu_splatting.utils.benchmarked import benchmarked

  rng = np.random.default_rng(0)
  shapes = [
      ("(N,)", (N,)),
      ("(N,3)", (N, 3)),
      ("(N,4)", (N, 4)),
      ("(N,7)", (N, 7)),
      ("(N,48)", (N, 48)),
      ("(N,3,16)", (N, 3, 16)),
      ("(3,N)", (3, N)),
      ("(N/4,128)", (N // 4, 128)),
  ]
  for name, shp in shapes:
    x = jnp.asarray(rng.random(shp, dtype=np.float32))
    nbytes = int(np.prod(shp)) * 4
    ms_r = benchmarked(f"read  {name}", lambda x: jnp.sum(x * 1.0001),
                       (x,), iters=20)
    ms_rw = benchmarked(f"r+w   {name}", lambda x: x * 1.0001, (x,),
                        iters=20)
    print(f"#  {name}: logical {nbytes / 1e6:.0f} MB -> "
          f"read {ms_r:.3f} ms ({nbytes / 1e6 / max(ms_r, 1e-9):.0f} GB/s "
          f"logical), r+w {ms_rw:.3f} ms")

  # small-dot fusion probes: (N,3) @ (3,3) vs scalar-expanded
  r = jnp.asarray(rng.random((3, 3), dtype=np.float32))
  x3 = jnp.asarray(rng.random((N, 3), dtype=np.float32))

  def dot(x):
    return jnp.sum((x @ r.T) * 1.0001)

  def expanded(x):
    c0, c1, c2 = x[:, 0], x[:, 1], x[:, 2]
    o0 = c0 * r[0, 0] + c1 * r[0, 1] + c2 * r[0, 2]
    o1 = c0 * r[1, 0] + c1 * r[1, 1] + c2 * r[1, 2]
    o2 = c0 * r[2, 0] + c1 * r[2, 1] + c2 * r[2, 2]
    return jnp.sum(o0 * 1.0001) + jnp.sum(o1) + jnp.sum(o2)

  benchmarked("dot (N,3)@(3,3)", dot, (x3,), iters=20)
  benchmarked("scalar-expanded", expanded, (x3,), iters=20)

  # SH-like contraction: (N,3,16) einsum vs (N,48) column form
  sh3 = jnp.asarray(rng.random((N, 3, 16), dtype=np.float32))
  sh2 = sh3.reshape(N, 48)
  basis = jnp.asarray(rng.random((N, 16), dtype=np.float32))

  def ein(sh, b):
    return jnp.sum(jnp.einsum("nkb,nb->nk", sh, b) * 1.0001)

  def cols(sh, b):
    acc = 0.0
    for k in range(3):
      s = sum(sh[:, k * 16 + j] * b[:, j] for j in range(16))
      acc = acc + jnp.sum(s * 1.0001)
    return acc

  benchmarked("sh einsum (N,3,16)", ein, (sh3, basis), iters=10)
  benchmarked("sh columns (N,48)", cols, (sh2, basis), iters=10)


if __name__ == "__main__":
  main()
