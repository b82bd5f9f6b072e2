"""PLY IO (native C++ + numpy fallback) and Morton ordering tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_splatting.io import ply
from tpu_splatting.misc.morton import argsort_morton, morton_codes


def make_gaussians(n=100, sh_bands=4, seed=0):
  from tpu_splatting.data_types import Gaussians3D
  rng = np.random.default_rng(seed)
  return Gaussians3D(
      position=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
      log_scaling=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
      rotation=jnp.asarray(rng.standard_normal((n, 4)), jnp.float32),
      alpha_logit=jnp.asarray(rng.standard_normal((n, 1)), jnp.float32),
      feature=jnp.asarray(rng.standard_normal((n, 3, sh_bands ** 2)),
                          jnp.float32))


@pytest.mark.parametrize("native", [True, False])
def test_ply_roundtrip(tmp_path, native, monkeypatch):
  if not native:
    monkeypatch.setattr(ply, "_LIB", None)
    monkeypatch.setattr(ply, "_LIB_FAILED", True)
  g = make_gaussians()
  path = str(tmp_path / "test.ply")
  ply.save_gaussians(path, g)
  g2 = ply.load_gaussians(path)

  np.testing.assert_allclose(np.asarray(g2.position), np.asarray(g.position))
  np.testing.assert_allclose(np.asarray(g2.rotation), np.asarray(g.rotation))
  np.testing.assert_allclose(np.asarray(g2.log_scaling),
                             np.asarray(g.log_scaling))
  np.testing.assert_allclose(np.asarray(g2.alpha_logit),
                             np.asarray(g.alpha_logit))
  np.testing.assert_allclose(np.asarray(g2.feature), np.asarray(g.feature))


def test_ply_3dgs_layout_and_sh_ordering(tmp_path):
  """Hand-built PLY in the canonical 3DGS checkpoint layout: verify property
  ordering and SH coefficient arrangement.  Official 3DGS stores f_rest
  channel-major: f_rest_{i*(B-1)+j} = features_rest[:, i, j] (channel i,
  coefficient j+1) — from gaussian_splatting/scene/gaussian_model.save_ply
  (features_rest.transpose(1, 2).flatten(1))."""
  n, b = 4, 4                      # degree-3: B = 16 coefficients
  props = {}
  props["x"] = np.arange(n, dtype=np.float32)
  props["y"] = np.arange(n, dtype=np.float32) + 10
  props["z"] = np.arange(n, dtype=np.float32) + 20
  for k in ("nx", "ny", "nz"):
    props[k] = np.zeros(n, np.float32)
  for i in range(3):
    props[f"f_dc_{i}"] = np.full(n, 100.0 + i, np.float32)
  nb = b * b - 1                   # 15 rest coefficients per channel
  for i in range(3):
    for j in range(nb):
      props[f"f_rest_{i * nb + j}"] = np.full(
          n, 1000.0 * i + j, np.float32)
  props["opacity"] = np.linspace(-1, 1, n).astype(np.float32)
  for i in range(3):
    props[f"scale_{i}"] = np.full(n, 0.1 * i, np.float32)
  # wxyz identity quaternion
  props["rot_0"] = np.ones(n, np.float32)
  for i in (1, 2, 3):
    props[f"rot_{i}"] = np.zeros(n, np.float32)

  path = str(tmp_path / "canonical.ply")
  ply.write_ply_raw(path, props)
  g = ply.load_gaussians(path)

  feat = np.asarray(g.feature)     # (N, 3, B^2)
  assert feat.shape == (n, 3, b * b)
  for i in range(3):
    np.testing.assert_array_equal(feat[:, i, 0], props[f"f_dc_{i}"])
    for j in range(nb):
      np.testing.assert_array_equal(
          feat[:, i, 1 + j], props[f"f_rest_{i * nb + j}"],
          err_msg=f"channel {i} coeff {j}")
  # wxyz -> xyzw conversion
  rot = np.asarray(g.rotation)
  np.testing.assert_array_equal(rot[:, 3], np.ones(n))
  np.testing.assert_array_equal(rot[:, :3], np.zeros((n, 3)))
  np.testing.assert_array_equal(np.asarray(g.position)[:, 1],
                                props["y"])


def test_native_and_numpy_agree(tmp_path):
  if ply._build_lib() is None:
    pytest.skip("no native lib")
  g = make_gaussians(n=57, sh_bands=2, seed=3)
  path = str(tmp_path / "x.ply")
  ply.save_gaussians(path, g)
  a = ply.read_ply_raw(path)
  b = ply._read_ply_raw_numpy(path)
  assert set(a) == set(b)
  for k in a:
    np.testing.assert_array_equal(a[k], b[k])


def test_morton_locality():
  rng = np.random.default_rng(0)
  pts = jnp.asarray(rng.random((2000, 3)), jnp.float32)
  codes = np.asarray(morton_codes(pts))
  assert codes.min() >= 0

  perm = np.asarray(argsort_morton(pts))
  assert sorted(perm.tolist()) == list(range(2000))
  # Morton order improves spatial locality: mean distance of consecutive
  # points should be much smaller than for random order
  p = np.asarray(pts)
  d_sorted = np.linalg.norm(np.diff(p[perm], axis=0), axis=1).mean()
  d_random = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
  assert d_sorted < d_random * 0.35


def test_index_features_and_segmented_sort():
  from tpu_splatting.misc.indexing import index_features, segmented_sort_pairs
  import jax

  feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
  idx = jnp.asarray([2, 0, 2])
  out = index_features(feats, idx)
  np.testing.assert_array_equal(np.asarray(out), np.asarray(feats)[[2, 0, 2]])

  # gather VJP scatter-adds duplicates
  g = jax.grad(lambda f: index_features(f, idx).sum())(feats)
  np.testing.assert_array_equal(np.asarray(g)[:, 0], [1, 0, 2, 0])

  keys = jnp.asarray([3, 1, 2, 9, 0], jnp.int32)
  vals = jnp.asarray([30, 10, 20, 90, 0], jnp.int32)
  segs = jnp.asarray([1, 0, 1, 0, 0], jnp.int32)
  sk, sv = segmented_sort_pairs(keys, vals, segs)
  np.testing.assert_array_equal(np.asarray(sk), [0, 1, 9, 2, 3])
  np.testing.assert_array_equal(np.asarray(sv), [0, 10, 90, 20, 30])


def test_check_finite():
  import pytest as _pytest
  from tpu_splatting.utils.check_finite import check_finite, count_nonfinite

  good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
  check_finite(good)

  bad = {"a": jnp.asarray([1.0, np.nan, np.inf])}
  assert sum(count_nonfinite(bad).values()) == 2
  with _pytest.raises(ValueError):
    check_finite(bad, "bad")


def test_autoencoder_example_converges():
  import sys
  from pathlib import Path
  sys.path.insert(0, str(Path(__file__).parent.parent))
  from examples.autoencoder import train
  _, loss = train(n=2000, steps=150, verbose=False)
  assert loss < 0.05, f"autoencoder failed to converge: {loss}"


def test_render_ply_example(tmp_path):
  """examples/render_ply.py: checkpoint PLY -> camera -> SH render -> image
  (the reference's render-a-checkpoint user loop, BENCHMARK.md:32-44)."""
  import sys
  from pathlib import Path
  sys.path.insert(0, str(Path(__file__).parent.parent))
  from examples.render_ply import main

  out = tmp_path / "render.npy"
  wm = main([str(tmp_path / "synt.ply"), "--synthetic", "500",
             "--image_size", "64,48", "--out", str(out)])
  assert wm > 0
  img = np.load(out)
  assert img.shape == (48, 64, 3)
  assert np.isfinite(img).all()
