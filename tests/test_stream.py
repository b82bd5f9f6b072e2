"""Tile-stream pipeline tests: the stream rasterizer must match the sorted
pipeline bit-for-semantics when depth16 keys are distinct (both then
composite in the same order), for outputs AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splatting import RasterConfig
from tpu_splatting.mapper.tile_mapper import map_to_tiles
from tpu_splatting.misc.renderer2d import project_gaussians2d
from tpu_splatting.rasterizer.function import rasterize_with_tiles
from tpu_splatting.rasterizer.stream import calibrate_stream, stream_map
from tpu_splatting.rasterizer.stream_function import (
    stream_rasterize_with_mapping)

from random_data import random_2d_gaussians


def make_scene(seed, n, image_size, scale_factor=0.45):
  rng = np.random.default_rng(seed)
  g2 = random_2d_gaussians(rng, n, image_size, num_channels=3,
                           scale_factor=scale_factor,
                           alpha_range=(0.2, 0.9), dtype=jnp.float32)
  packed = project_gaussians2d(g2)
  # distinct depth16 keys so stream (depth16 order) == sorted (exact depth)
  depths = jnp.asarray(
      rng.permutation(n).astype(np.float32) + 0.5) / n
  return packed, depths, g2.feature


def run_both(seed, n=80, image_size=(32, 24), group_width=2):
  config = RasterConfig(tile_size=8, chunk_size=8)
  packed, depths, feats = make_scene(seed, n, image_size)

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=feats)
  assert int(sm.num_overflow) == 0
  img_s = rasterize_with_tiles(packed, feats, sm, image_size, config)

  cal = calibrate_stream(packed, depths, feats, image_size, config,
                         group_width=group_width)
  mm = stream_map(packed, depths, feats, image_size, config,
                  num_slabs=max(cal["num_slabs"], 2),
                  strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
                  group_width=group_width, w_max=cal["w_max"],
                  run_cap=cal["run_cap"])
  assert int(mm.num_overflow) == 0
  img_t, alpha_t = stream_rasterize_with_mapping(
      packed, feats, mm, image_size, config)
  return (np.asarray(img_s.image), np.asarray(img_s.image_weight),
          np.asarray(img_t), np.asarray(alpha_t))


@pytest.mark.parametrize(
    "seed", [0, 1, *(pytest.param(x, marks=pytest.mark.slow)
                     for x in range(2, 4))])
def test_stream_forward_matches_sorted(seed):
  img_s, w_s, img_t, w_t = run_both(seed)
  np.testing.assert_allclose(img_t, img_s, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(w_t, w_s, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "seed", [0, *(pytest.param(x, marks=pytest.mark.slow)
                  for x in range(1, 3))])
def test_stream_gradients_match_sorted(seed):
  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size = (32, 24)
  n = 70
  packed, depths, feats = make_scene(seed + 10, n, image_size)
  tgt = jnp.asarray(
      np.random.default_rng(0).random((24, 32, 3)).astype(np.float32))

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=feats)

  def loss_sorted(p, f):
    out = rasterize_with_tiles(p, f, sm, image_size, config)
    return jnp.sum((out.image - tgt) ** 2) + jnp.sum(out.image_weight ** 2)

  cal = calibrate_stream(packed, depths, feats, image_size, config,
                         group_width=2)
  mm = stream_map(packed, depths, feats, image_size, config,
                  num_slabs=max(cal["num_slabs"], 2),
                  strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
                  group_width=2, w_max=cal["w_max"], run_cap=cal["run_cap"])
  assert int(mm.num_overflow) == 0

  def loss_stream(p, f):
    img, w = stream_rasterize_with_mapping(
        p, f, mm, image_size, config)
    return jnp.sum((img - tgt) ** 2) + jnp.sum(w ** 2)

  ls, (gp_s, gf_s) = jax.value_and_grad(loss_sorted, argnums=(0, 1))(
      packed, feats)
  lt, (gp_t, gf_t) = jax.value_and_grad(loss_stream, argnums=(0, 1))(
      packed, feats)

  np.testing.assert_allclose(float(lt), float(ls), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_s),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_s),
                             atol=1e-4, rtol=1e-4)
