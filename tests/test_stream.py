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
    probe_width, stream_rasterize_with_mapping)

from random_data import random_2d_gaussians

# ONE tight cap set shared by every test scene (all calibrated to need
# strip <= 48 rows, run <= 12, slab rows <= 29, w <= 13): interpret-mode
# execution and 1-CPU XLA compiles both scale with these static
# capacities, and sharing one set maximizes in-process jit-cache reuse —
# together they cut the fast tier's wall clock ~3x.
TIGHT = dict(num_slabs=2, strip_cap=128, slab_cap=256, w_max=16, run_cap=16)


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


def run_both(seed, n=80, image_size=(32, 24), group_width=2,
             calibrate=False):
  config = RasterConfig(tile_size=8, chunk_size=8)
  packed, depths, feats = make_scene(seed, n, image_size)

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=feats)
  assert int(sm.num_overflow) == 0
  img_s = rasterize_with_tiles(packed, feats, sm, image_size, config)

  if calibrate:   # exercised once — each calibration pass is a fresh
    # stream_map compile, too slow for every fast-tier test
    cal = calibrate_stream(packed, depths, feats, image_size, config,
                           group_width=group_width)
    cal["num_slabs"] = max(cal["num_slabs"], 2)
  else:
    cal = dict(TIGHT)
  mm = stream_map(packed, depths, feats, image_size, config,
                  num_slabs=cal["num_slabs"],
                  strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
                  group_width=group_width, w_max=cal["w_max"],
                  run_cap=cal["run_cap"])
  assert int(mm.num_overflow) == 0
  img_t, alpha_t = stream_rasterize_with_mapping(
      packed, feats, mm, image_size, config)
  return (np.asarray(img_s.image), np.asarray(img_s.image_weight),
          np.asarray(img_t), np.asarray(alpha_t))


@pytest.mark.parametrize(
    "seed", [0, *(pytest.param(x, marks=pytest.mark.slow)
                  for x in range(1, 4))])
def test_stream_forward_matches_sorted(seed):
  # seed 0 additionally exercises calibrate_stream end-to-end
  img_s, w_s, img_t, w_t = run_both(seed, calibrate=seed == 0)
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

  mm = stream_map(packed, depths, feats, image_size, config,
                  group_width=2, **TIGHT)
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


def _stream_mapping(packed, depths, feats, image_size, config,
                    group_width=2):
  mm = stream_map(packed, depths, feats, image_size, config,
                  group_width=group_width, **TIGHT)
  assert int(mm.num_overflow) == 0
  return mm


@pytest.mark.parametrize(
    "antialias", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_stream_probe_outputs_match_sorted(antialias):
  """Visibility + heuristics surface as probe cotangents on the stream
  path and must equal the sorted pipeline's forward visibility and probe
  heuristics (same reference semantics, backward.py:190-194)."""
  config = RasterConfig(tile_size=8, chunk_size=8, antialias=antialias,
                        compute_point_heuristic=True,
                        compute_visibility=True)
  image_size = (32, 24)
  n = 80
  packed, depths, feats = make_scene(3, n, image_size)
  tgt = jnp.asarray(
      np.random.default_rng(0).random((24, 32, 3)).astype(np.float32))

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=feats)

  def loss_sorted(p, f, pr):
    out = rasterize_with_tiles(p, f, sm, image_size, config,
                               heuristic_probe=pr)
    return (jnp.sum((out.image - tgt) ** 2)
            + jnp.sum(out.image_weight ** 2)), out.visibility

  probe_s = jnp.zeros((n, 2), jnp.float32)
  (_, vis_s), (gp_s, gf_s, heur_s) = jax.value_and_grad(
      loss_sorted, argnums=(0, 1, 2), has_aux=True)(packed, feats, probe_s)

  mm = _stream_mapping(packed, depths, feats, image_size, config)
  probe_t = jnp.zeros((n, probe_width(config)), jnp.float32)

  def loss_stream(p, f, pr):
    img, w = stream_rasterize_with_mapping(p, f, mm, image_size, config,
                                           probe=pr)
    return jnp.sum((img - tgt) ** 2) + jnp.sum(w ** 2)

  _, (gp_t, gf_t, gpr_t) = jax.value_and_grad(
      loss_stream, argnums=(0, 1, 2))(packed, feats, probe_t)

  np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_s),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_s),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gpr_t[:, 0]), np.asarray(vis_s),
                             atol=1e-5, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gpr_t[:, 1:]), np.asarray(heur_s),
                             atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_stream_quantile_mode_matches_sorted():
  """Non-blending (median/quantile) mode: select-first-crossing semantics
  (reference forward.py:105-112), forward-only."""
  config = RasterConfig(tile_size=8, chunk_size=8,
                        use_alpha_blending=False, saturate_threshold=0.25)
  image_size = (32, 24)
  n = 80
  packed, depths, _ = make_scene(7, n, image_size)
  dfeat = depths[:, None]

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=dfeat)
  out_s = rasterize_with_tiles(packed, dfeat, sm, image_size, config)

  mm = _stream_mapping(packed, depths, dfeat, image_size, config)
  img_t, w_t = stream_rasterize_with_mapping(packed, dfeat, mm,
                                             image_size, config)
  np.testing.assert_allclose(np.asarray(img_t[..., 0]),
                             np.asarray(out_s.image[..., 0]), atol=1e-5)
  np.testing.assert_allclose(np.asarray(w_t),
                             np.asarray(out_s.image_weight), atol=1e-5)


@pytest.mark.slow
def test_stream_wide_gaussians_match_sorted():
  """Wide splats (reach beyond +-1 tile of home, here ~100 px radius) are
  duplicated across their span tiles at map time and their gradients
  scatter-add back; image + grads must match the sorted pipeline's
  big-gaussian path (reference grid_query.py:9-27 handles arbitrary
  spans)."""
  rng = np.random.default_rng(11)
  n, image_size = 60, (64, 48)
  g2 = random_2d_gaussians(rng, n, image_size, num_channels=3,
                           scale_factor=0.4, alpha_range=(0.2, 0.9),
                           dtype=jnp.float32)
  packed = np.array(project_gaussians2d(g2), copy=True)
  packed[:8, 4:6] = rng.uniform(20.0, 35.0, (8, 2))  # sigma ~30px
  packed = jnp.asarray(packed)
  depths = jnp.asarray(rng.permutation(n).astype(np.float32) + 0.5) / n
  feats = g2.feature
  config = RasterConfig(tile_size=8, chunk_size=8, big_tile_window=16)
  tgt = jnp.asarray(rng.random((48, 64, 3)).astype(np.float32))

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=8192,
                    features=feats)
  assert int(sm.num_overflow) == 0

  def loss_sorted(p, f):
    out = rasterize_with_tiles(p, f, sm, image_size, config)
    return (jnp.sum((out.image - tgt) ** 2)
            + jnp.sum(out.image_weight ** 2), out)

  (_, out_s), (gp_s, gf_s) = jax.value_and_grad(
      loss_sorted, argnums=(0, 1), has_aux=True)(packed, feats)

  mm = stream_map(packed, depths, feats, image_size, config, group_width=2,
                  wide_cap=64, dup_cap=512, **TIGHT)
  assert int(mm.num_overflow) == 0

  def loss_stream(p, f):
    img, w = stream_rasterize_with_mapping(p, f, mm, image_size, config)
    return jnp.sum((img - tgt) ** 2) + jnp.sum(w ** 2), (img, w)

  (_, (img_t, w_t)), (gp_t, gf_t) = jax.value_and_grad(
      loss_stream, argnums=(0, 1), has_aux=True)(packed, feats)

  np.testing.assert_allclose(np.asarray(img_t), np.asarray(out_s.image),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(w_t),
                             np.asarray(out_s.image_weight),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_s),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_s),
                             atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("gw", [8, 4])
def test_stream_group_width8(gw):
  """gw=8 (the widest advertised group, one group per band, both tiles of
  the group on an image edge — covers the edge-band fetch and the
  edge-group shrunk k=0/k=2 gradient writes at full width) and gw=4 (two
  groups per band: interior group boundaries at width 4)."""
  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size = (64, 24)   # tw=8 -> groups_x = 8 // gw
  n = 90
  packed, depths, feats = make_scene(5, n, image_size)
  tgt = jnp.asarray(
      np.random.default_rng(0).random((24, 64, 3)).astype(np.float32))

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=8192,
                    features=feats)

  def loss_sorted(p, f):
    out = rasterize_with_tiles(p, f, sm, image_size, config)
    return jnp.sum((out.image - tgt) ** 2) + jnp.sum(out.image_weight ** 2)

  mm = stream_map(packed, depths, feats, image_size, config, group_width=gw,
                  wide_cap=64, dup_cap=256, **TIGHT)
  assert int(mm.num_overflow) == 0

  def loss_stream(p, f):
    img, w = stream_rasterize_with_mapping(p, f, mm, image_size, config)
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


@pytest.mark.slow
def test_stream_overflow_counted():
  """Capacity overflow is COUNTED, never silent: (a) wide splats with
  duplication disabled count their uncovered span; (b) a tiny slab_cap
  counts dropped rows."""
  rng = np.random.default_rng(13)
  n, image_size = 40, (64, 48)
  g2 = random_2d_gaussians(rng, n, image_size, num_channels=3,
                           scale_factor=0.3, alpha_range=(0.3, 0.9),
                           dtype=jnp.float32)
  packed = np.array(project_gaussians2d(g2), copy=True)
  packed[:5, 0:2] = np.asarray([[32.0, 24.0]] * 5)  # centred, wide
  packed[:5, 4:6] = 20.0                             # sigma 20px
  packed[5:, 4:6] = 1.0   # everything else narrow: exactly 5 wide splats
  packed = jnp.asarray(packed)
  depths = jnp.asarray(rng.permutation(n).astype(np.float32) + 0.5) / n
  config = RasterConfig(tile_size=8, chunk_size=8)

  # (a) duplication disabled: exactly the 5 wide splats count as overflow
  mm = stream_map(packed, depths, g2.feature, image_size, config,
                  group_width=2, num_slabs=2, strip_cap=128, slab_cap=64,
                  w_max=16, run_cap=16, dup_cap=0)
  assert int(mm.num_overflow) == 5

  # (b) slab rows beyond slab_cap are counted (deep centre tiles)
  mm2 = stream_map(packed, depths, g2.feature, image_size, config,
                   group_width=2, num_slabs=1, strip_cap=128, slab_cap=8,
                   w_max=16, run_cap=16, dup_cap=512)
  assert int(mm2.num_overflow) > 0


@pytest.mark.slow
def test_stream_f64_gradcheck():
  """Direct f64 central-difference gradcheck of the stream custom_vjp
  (not just agreement with the sorted pipeline)."""
  from gradcheck import check_grads
  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size = (16, 16)
  n = 30
  packed, depths, feats = make_scene(17, n, image_size)
  packed = packed.astype(jnp.float64)
  feats = feats.astype(jnp.float64)
  depths = depths.astype(jnp.float64)
  def f(p, f_):
    # the mapping's table is a copy of the inputs, so finite differences
    # must REBUILD it from the perturbed inputs; the custom_vjp defines
    # the gradient w.r.t. the original arrays (mapping cotangent float0)
    mm = stream_map(p, depths, f_, image_size, config, group_width=2,
                    **TIGHT)
    img, w = stream_rasterize_with_mapping(p, f_, mm, image_size, config)
    return img, w

  mm0 = stream_map(packed, depths, feats, image_size, config,
                   group_width=2, **TIGHT)
  assert int(mm0.num_overflow) == 0

  check_grads(f, (packed, feats), rtol=1e-5, atol=1e-5, n_directions=2)


@pytest.mark.slow
def test_stream_depth12_key_layout():
  """The >16k-tile key layout (16-bit home, 12-bit depth) must composite
  identically to the sorted pipeline when d12 keys are distinct — covers
  the 4096 px envelope (reference benches at 4096, BENCHMARK.md) without
  paying for a 4096 px interpret run."""
  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size = (32, 24)
  n = 60   # n*16 < 2^16 so d12 keys stay distinct
  packed, _, feats = make_scene(21, n, image_size)
  rng = np.random.default_rng(21)
  depths = jnp.asarray(
      (rng.permutation(n).astype(np.float32) + 0.5) / n)

  sm = map_to_tiles(packed, depths, image_size, config, max_overlaps=4096,
                    features=feats)
  out_s = rasterize_with_tiles(packed, feats, sm, image_size, config)

  mm = stream_map(packed, depths, feats, image_size, config, group_width=2,
                  depth_bits=12, **TIGHT)
  assert int(mm.num_overflow) == 0
  assert mm.depth_bits == 12
  img_t, w_t = stream_rasterize_with_mapping(packed, feats, mm,
                                             image_size, config)
  np.testing.assert_allclose(np.asarray(img_t), np.asarray(out_s.image),
                             atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(w_t),
                             np.asarray(out_s.image_weight),
                             atol=1e-5, rtol=1e-5)


def test_stream_overflow_by_cause():
  """num_overflow splits into per-cause counters [wide, strip, slab, run,
  window] that sum to it — a trainer can tell WHICH capacity to bump."""
  rng = np.random.default_rng(13)
  n, image_size = 40, (64, 48)
  g2 = random_2d_gaussians(rng, n, image_size, num_channels=3,
                           scale_factor=0.3, alpha_range=(0.3, 0.9),
                           dtype=jnp.float32)
  packed = np.array(project_gaussians2d(g2), copy=True)
  packed[:5, 0:2] = np.asarray([[32.0, 24.0]] * 5)
  packed[:5, 4:6] = 20.0
  packed[5:, 4:6] = 1.0
  packed = jnp.asarray(packed)
  depths = jnp.asarray(rng.permutation(n).astype(np.float32) + 0.5) / n
  config = RasterConfig(tile_size=8, chunk_size=8)

  # wide splats with duplication disabled land in cause 0 (wide)
  mm = stream_map(packed, depths, g2.feature, image_size, config,
                  group_width=2, num_slabs=2, strip_cap=128, slab_cap=64,
                  w_max=16, run_cap=16, dup_cap=0)
  ov = np.asarray(mm.overflow)
  assert ov.shape == (5,)
  assert ov[0] == 5 and ov.sum() == int(mm.num_overflow) == 5

  # a tiny slab_cap lands in cause 2 (slab)
  mm2 = stream_map(packed, depths, g2.feature, image_size, config,
                   group_width=2, num_slabs=1, strip_cap=128, slab_cap=8,
                   w_max=16, run_cap=16, dup_cap=512)
  ov2 = np.asarray(mm2.overflow)
  assert ov2[2] > 0 and ov2.sum() == int(mm2.num_overflow)


@pytest.mark.slow
def test_calibrate_wide_scene_no_overflow():
  """Round-3 regression: calibration must measure with the FINAL
  wide_cap/dup_cap threaded in — on a scene whose duplicate rows rival the
  main rows in hot tiles, caps sized from duplication-free statistics
  overflow.  The calibration contract is num_overflow == 0 at the
  returned capacities."""
  import dataclasses
  rng = np.random.default_rng(29)
  n, image_size = 1500, (256, 192)
  packed = np.zeros((n, 7), np.float32)
  # heavy clustering + a fat wide tail, miniature of bench.py heavy_scene
  centres = np.stack([rng.uniform(0, 256, 16), rng.uniform(0, 192, 16)],
                     1)
  pos = centres[rng.integers(0, 16, n)] + rng.normal(0, 12.0, (n, 2))
  packed[:, 0] = np.clip(pos[:, 0], 0, 255)
  packed[:, 1] = np.clip(pos[:, 1], 0, 191)
  theta = rng.uniform(0, np.pi, n)
  packed[:, 2] = np.cos(theta)
  packed[:, 3] = np.sin(theta)
  s = np.exp(rng.normal(0.2, 0.9, n)).astype(np.float32)
  packed[:, 4] = np.clip(s, 0.05, 30.0)
  packed[:, 5] = np.clip(s * np.exp(-np.abs(rng.normal(0, 0.7, n))),
                         0.05, 30.0).astype(np.float32)
  packed[:, 6] = rng.uniform(0.3, 0.95, n)
  # two splats spanning more tiles than the default big_tile_window (16):
  # calibration must WIDEN the window (clipped spans are overflow no cap
  # increase can fix — the round-3 heavy-scene failure mode)
  packed[:2, 0:2] = [[128.0, 96.0], [100.0, 80.0]]
  packed[:2, 4:6] = 60.0
  packed[:2, 6] = 0.9
  packed = jnp.asarray(packed)
  depths = jnp.asarray(rng.permutation(n).astype(np.float32) + 0.5) / n
  feats = jnp.asarray(rng.random((n, 3)).astype(np.float32))
  config = RasterConfig(tile_size=8, chunk_size=8)

  cal = calibrate_stream(packed, depths, feats, image_size, config,
                         group_width=2, slab_cap=256)
  assert cal["num_dup_rows"] > 200, "scene must exercise duplication"
  assert cal["big_tile_window"] > 16, cal
  config = dataclasses.replace(config,
                               big_tile_window=cal["big_tile_window"])
  mm = stream_map(packed, depths, feats, image_size, config,
                  group_width=2, num_slabs=cal["num_slabs"],
                  strip_cap=cal["strip_cap"], slab_cap=cal["slab_cap"],
                  w_max=cal["w_max"], run_cap=cal["run_cap"],
                  wide_cap=cal["wide_cap"], dup_cap=cal["dup_cap"])
  assert int(mm.num_overflow) == 0, (
      cal, [int(x) for x in mm.overflow])


def test_stream_share_asm_guard():
  """share_asm=False must produce the same gradients as the default
  shared-assembly backward, and asm_feasible must reject mappings whose
  per-group assembled blocks exceed the VMEM budget (the guard then
  routes exactly to the share_asm=False code path)."""
  import dataclasses

  from tpu_splatting.rasterizer.stream_kernels import asm_feasible

  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size, n = (32, 24), 80
  packed, depths, feats = make_scene(6, n, image_size)
  mm = stream_map(packed, depths, feats, image_size, config,
                  group_width=2, **TIGHT)
  assert int(mm.num_overflow) == 0
  assert asm_feasible(mm)

  def grads(cfg):
    def loss(p, f_):
      img, w = stream_rasterize_with_mapping(p, f_, mm, image_size, cfg)
      return jnp.sum(img * img) + jnp.sum(w)
    return jax.grad(loss, argnums=(0, 1))(packed, feats)

  g_shared = grads(config)
  g_plain = grads(dataclasses.replace(config, stream_share_asm=False))
  for a, b in zip(g_shared, g_plain):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-6, rtol=1e-6)

  # a many-slab mapping's asm blocks exceed the VMEM budget: the guard
  # must flip (shape-only check — no kernel execution involved)
  big = dataclasses.replace(mm, num_slabs=512)
  assert not asm_feasible(big)

  # per-group blocks within VMEM but the HBM residual (one block per
  # group) over budget: many-group scenes must also be rejected
  assert not asm_feasible(mm, dataclasses.replace(
      config, stream_asm_budget_mb=0))
  assert asm_feasible(mm, config)


def test_stream_banded_backward_matches():
  """The band-chunked backward (scan over band chunks with halo merge,
  for scenes whose gradient-slab buffer exceeds the HBM budget) must
  produce the same gradients as the single-pass backward."""
  import dataclasses
  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size, n = (32, 24), 80
  packed, depths, feats = make_scene(5, n, image_size)
  mm = stream_map(packed, depths, feats, image_size, config,
                  group_width=2, **TIGHT)
  assert int(mm.num_overflow) == 0

  def grads(cfg):
    def loss(p, f_):
      img, w = stream_rasterize_with_mapping(p, f_, mm, image_size, cfg)
      return jnp.sum(img * img) + jnp.sum(w)
    return jax.grad(loss, argnums=(0, 1))(packed, feats)

  g_ref = grads(config)
  cfg_banded = dataclasses.replace(config, stream_gout_budget_mb=1)
  # make sure the tiny budget actually triggers chunking on this scene
  from tpu_splatting.rasterizer.stream_function import _gout_band_bytes
  assert mm.tiles_high * _gout_band_bytes(mm, mm.run_cap) > (1 << 20)
  g_banded = grads(cfg_banded)
  for a, b in zip(g_ref, g_banded):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-6, rtol=1e-6)


def test_stream_window_chunking_deep_tile():
  """Merged windows longer than the kernels' largest tiered copy
  (STRIP_SLACK rows) must CHUNK into multiple <= WINDOW_CHUNK-row
  descriptors, and calibration mode (build_table=False) must count
  EXACTLY what a production build counts — the r4 heavy-scene failure
  was a build-only clamp here that calibration could not observe.  The
  reference handles arbitrary-depth tiles natively
  (taichi_splatting/mapper/tile_mapper.py:114-146)."""
  from tpu_splatting.rasterizer.stream import STRIP_SLACK

  config = RasterConfig(tile_size=8, chunk_size=8)
  image_size = (16, 8)
  n = 700                       # one ~700-row home run, single depth cell
  rng = np.random.default_rng(5)
  packed = np.zeros((n, 7), np.float32)
  packed[:, 0] = rng.uniform(1.5, 6.5, n)          # all inside tile 0
  packed[:, 1] = rng.uniform(1.5, 6.5, n)
  theta = rng.uniform(0, np.pi, n)
  packed[:, 2] = np.cos(theta)
  packed[:, 3] = np.sin(theta)
  packed[:, 4:6] = rng.uniform(0.3, 0.6, (n, 2))   # tiny: reach class C
  packed[:, 6] = rng.uniform(0.2, 0.5, n)
  depths = (rng.permutation(n).astype(np.float32) + 0.5) / n
  feats = rng.random((n, 3)).astype(np.float32)
  packed, depths, feats = (jnp.asarray(packed), jnp.asarray(depths),
                           jnp.asarray(feats))

  caps = dict(num_slabs=1, strip_cap=512, slab_cap=768, w_max=8,
              run_cap=1024, group_width=2)
  mm = stream_map(packed, depths, feats, image_size, config, **caps)
  mc = stream_map(packed, depths, feats, image_size, config,
                  build_table=False, **caps)
  # identical overflow accounting in both modes, and nothing dropped
  np.testing.assert_array_equal(np.asarray(mm.overflow),
                                np.asarray(mc.overflow))
  assert int(mm.num_overflow) == 0

  # chunking actually engaged: some descriptor is a full WINDOW_CHUNK
  desc = np.asarray(mm.desc).reshape(mm.num_groups, 2, 1, 8, 4)
  assert int(desc[..., 1].max()) == STRIP_SLACK - mm.rows_per_block

  # chunked assembly composites and differentiates exactly like the
  # sorted pipeline (depth16 keys distinct by construction)
  sm = map_to_tiles(packed, depths, image_size, config,
                    max_overlaps=8192, features=feats)
  assert int(sm.num_overflow) == 0
  tgt = jnp.asarray(
      np.random.default_rng(0).random((8, 16, 3)).astype(np.float32))

  def loss_sorted(p, f):
    out = rasterize_with_tiles(p, f, sm, image_size, config)
    return jnp.sum((out.image - tgt) ** 2)

  def loss_stream(p, f):
    img, _ = stream_rasterize_with_mapping(p, f, mm, image_size, config)
    return jnp.sum((img - tgt) ** 2)

  ls, (gp_s, gf_s) = jax.value_and_grad(loss_sorted, argnums=(0, 1))(
      packed, feats)
  lt, (gp_t, gf_t) = jax.value_and_grad(loss_stream, argnums=(0, 1))(
      packed, feats)
  np.testing.assert_allclose(float(lt), float(ls), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_s),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_s),
                             atol=1e-4, rtol=1e-4)
