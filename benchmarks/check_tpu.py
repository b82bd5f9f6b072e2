"""TPU-vs-CPU numeric validation of the stream pipeline (VERDICT r2 #4).

Renders a small scene through stream_map + stream fwd+bwd twice — once on
the real TPU chip (bf16 split ladders, pltpu.roll copy-back, DEFAULT-
precision contractions) and once on CPU (interpret mode, exact f32
matmuls) — and compares images and gradients row-by-row.  The CPU
interpret path is oracle-tested elsewhere (tests/test_stream.py vs the
sorted pipeline and the sequential reference), so agreement here closes
the "shipped TPU code path is untested" gap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/check_tpu.py
Prints one PASS/FAIL line per quantity plus error quantiles.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def make_scene(n, image_size, seed=0, n_culled=64, n_dim=64, n_wide=32):
  rng = np.random.default_rng(seed)
  w, h = image_size
  packed = np.zeros((n, 7), np.float32)
  packed[:, 0] = rng.uniform(0, w, n)
  packed[:, 1] = rng.uniform(0, h, n)
  th = rng.uniform(0, np.pi, n)
  packed[:, 2] = np.cos(th)
  packed[:, 3] = np.sin(th)
  packed[:, 4:6] = (rng.random((n, 2)) + 0.2) * 2.5
  packed[:, 6] = rng.uniform(0.1, 0.9, n)
  # a wide-splat tail (sigma to ~25 px, span within big_tile_window)
  # exercises the duplication path: dup rows through the kernels, dup
  # scatter-add in the reduce
  packed[-n_wide:, 4:6] = rng.uniform(10.0, 25.0, (n_wide, 2))
  # DISTINCT d14 depth keys per point (needs n < 2^14 / 4-ish): the sort
  # key ties of coincident quantized depths are broken arbitrarily and
  # DIFFERENTLY per backend — coincident rows then composite in swapped
  # order, which moves gradient attribution between them.  That is
  # reference-equivalent behaviour (depth16 mode ties are arbitrary too),
  # but a cross-backend comparison needs tie-free keys.
  assert n * 4 < (1 << 16), "need distinct d14 keys for cross-backend diff"
  depth = ((rng.permutation(n).astype(np.float32) + 0.5) / n).astype(
      np.float32)
  depth[:n_culled] = -1.0                       # behind-camera sentinels
  packed[n_culled:n_culled + n_dim, 6] = 1e-4   # below alpha threshold
  feats = rng.random((n, 3)).astype(np.float32)
  return packed, depth, feats


def run_on(device, packed, depth, feats, image_size, config, caps):
  import jax
  import jax.numpy as jnp
  from tpu_splatting.rasterizer.stream import stream_map
  from tpu_splatting.rasterizer.stream_function import (
      probe_width, stream_rasterize_with_mapping)

  gw = int(os.environ.get("TPU_SPLAT_GW", "2"))
  with jax.default_device(device):
    p = jnp.asarray(packed)
    d = jnp.asarray(depth)
    f = jnp.asarray(feats)
    m = stream_map(p, d, f, image_size, config, group_width=gw, **caps)
    overflow = int(m.num_overflow)

    def loss(p, f, probe):
      img, wgt = stream_rasterize_with_mapping(
          p, f, m, image_size, config, probe=probe)
      return (jnp.sum((img - 0.5) ** 2) + jnp.sum(wgt ** 2)), (img, wgt)

    probe = jnp.zeros((p.shape[0], probe_width(config)), jnp.float32)
    (lval, (img, wgt)), grads = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(p, f, probe)
    out = dict(loss=lval, image=img, weight=wgt, g_points=grads[0],
               g_feats=grads[1], g_probe=grads[2], overflow=overflow)
    return {k: (np.asarray(jax.device_get(v)) if k != "overflow" else v)
            for k, v in out.items()}


def make_deep_scene(n, image_size, seed=3):
  """A scene with one very deep tile (~900 rows in a single depth cell):
  at slab_cap 1024 the merged window exceeds the kernels' largest tiered
  copy (STRIP_SLACK) and must CHUNK into multiple descriptors — validates
  the chunked assembly + copy-back on the real chip."""
  rng = np.random.default_rng(seed)
  w, h = image_size
  packed = np.zeros((n, 7), np.float32)
  packed[:, 0] = rng.uniform(0, w, n)
  packed[:, 1] = rng.uniform(0, h, n)
  n_deep = 900
  packed[:n_deep, 0] = rng.uniform(18.0, 30.0, n_deep)   # tile (1, 1), ts 16
  packed[:n_deep, 1] = rng.uniform(18.0, 30.0, n_deep)
  th = rng.uniform(0, np.pi, n)
  packed[:, 2] = np.cos(th)
  packed[:, 3] = np.sin(th)
  packed[:, 4:6] = (rng.random((n, 2)) + 0.3) * 1.2
  packed[:, 6] = rng.uniform(0.1, 0.4, n)
  assert n * 4 < (1 << 16)
  depth = ((rng.permutation(n).astype(np.float32) + 0.5) / n).astype(
      np.float32)
  feats = rng.random((n, 3)).astype(np.float32)
  return packed, depth, feats


def compare(name, a, b, rtol, atol):
  err = np.abs(a - b)
  scale = np.maximum(np.abs(b), atol / max(rtol, 1e-30))
  rel = err / scale
  ok = bool((err <= atol + rtol * np.abs(b)).all())
  print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs={err.max():.3e} "
        f"rel_p50={np.quantile(rel, 0.5):.2e} "
        f"rel_p99={np.quantile(rel, 0.99):.2e} rel_max={rel.max():.3e}")
  return ok


def check(tag, packed, depth, feats, image_size, config, caps,
          n_zero_grad=0):
  import jax
  passes = config.stream_passes
  gw = int(os.environ.get("TPU_SPLAT_GW", "2"))
  n = packed.shape[0]
  tpu = [d for d in jax.devices() if d.platform != "cpu"]
  cpu = jax.devices("cpu")
  assert tpu, "no TPU device — run under the axon platform"

  # the interpret-mode oracle takes minutes; cache it on disk keyed by the
  # scene/config so TPU-side iteration after a kernel change is seconds
  key = (f"{tag}_n{n}_w{image_size[0]}x{image_size[1]}_p{passes}_gw{gw}_"
         + "_".join(f"{k}{v}" for k, v in sorted(caps.items())))
  cache = f"/tmp/check_tpu_ref_{key}.npz"
  if os.path.exists(cache) and not os.environ.get("TPU_SPLAT_NOCACHE"):
    print(f"# CPU oracle from cache {cache}", file=sys.stderr)
    with np.load(cache) as z:
      ref = {k: (int(z[k]) if k == "overflow" else z[k]) for k in z.files}
  else:
    print(f"# running CPU oracle for {tag} (interpret mode)...",
          file=sys.stderr)
    ref = run_on(cpu[0], packed, depth, feats, image_size, config, caps)
    np.savez(cache, **ref)
  print(f"# running {tag} on TPU...", file=sys.stderr)
  got = run_on(tpu[0], packed, depth, feats, image_size, config, caps)

  print(f"[{tag}] overflow cpu={ref['overflow']} tpu={got['overflow']}")
  assert ref["overflow"] == 0, "scene overflows its capacities — invalid"

  ok = True
  ok &= compare(f"{tag} loss", got["loss"], ref["loss"], 5e-3, 1e-3)
  ok &= compare(f"{tag} image", got["image"], ref["image"], 2e-2, 2e-3)
  ok &= compare(f"{tag} weight", got["weight"], ref["weight"], 2e-2, 2e-3)
  ok &= compare(f"{tag} g_points", got["g_points"], ref["g_points"], 5e-2,
                2e-2 * np.abs(ref["g_points"]).max())
  ok &= compare(f"{tag} g_feats", got["g_feats"], ref["g_feats"], 5e-2,
                2e-2 * np.abs(ref["g_feats"]).max())
  ok &= compare(f"{tag} g_probe (vis/heur)", got["g_probe"],
                ref["g_probe"], 5e-2, 2e-2 * np.abs(ref["g_probe"]).max())

  if n_zero_grad:
    culled = np.abs(got["g_points"][:n_zero_grad]).max()
    print(f"{'PASS' if culled == 0 else 'FAIL'} culled rows zero-grad "
          f"(max={culled:.3e})")
    ok &= culled == 0
  return ok


def main():
  import jax
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

  from tpu_splatting import RasterConfig

  passes = int(os.environ.get("TPU_SPLAT_PASSES", "2"))
  config = RasterConfig(compute_point_heuristic=True,
                        compute_visibility=True, stream_passes=passes)

  image_size = (256, 192)
  caps = dict(num_slabs=6, strip_cap=2048, slab_cap=512, w_max=40,
              run_cap=512, wide_cap=256, dup_cap=16384)
  packed, depth, feats = make_scene(12_000, image_size)
  ok = check("main", packed, depth, feats, image_size, config, caps,
             n_zero_grad=128)

  # deep-tile scene: chunked window descriptors (window > STRIP_SLACK)
  deep_size = (256, 48)     # tw = 16: divisible by every group width
  deep_caps = dict(num_slabs=1, strip_cap=1024, slab_cap=1280, w_max=16,
                   run_cap=1024, wide_cap=0, dup_cap=0)
  dp, dd, df = make_deep_scene(3_000, deep_size)
  ok &= check("deep", dp, dd, df, deep_size, config, deep_caps)

  print("ALL PASS" if ok else "FAILURES — see above")
  sys.exit(0 if ok else 1)


if __name__ == "__main__":
  main()
