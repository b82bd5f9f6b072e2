"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_splatting import RasterConfig
from tpu_splatting.optim import GroupConfig
from tpu_splatting.parallel.data_parallel import (data_parallel_loss,
                                                  make_mesh, make_train_step,
                                                  sharded_projection)

from random_data import random_3d_gaussians, random_camera


def make_scene(n_points=256, image_size=(32, 32), seed=0):
  rng = np.random.default_rng(seed)
  camera = random_camera(rng, image_size=image_size)
  gaussians = random_3d_gaussians(rng, n_points, camera)
  gaussians = jax.tree.map(lambda x: x.astype(jnp.float32), gaussians)
  camera = camera.replace(
      projection=camera.projection.astype(jnp.float32),
      T_camera_world=camera.T_camera_world.astype(jnp.float32))
  return gaussians, camera


def test_data_parallel_loss_matches_single_device():
  gaussians, camera = make_scene()
  config = RasterConfig(tile_size=16, chunk_size=16)
  mesh = make_mesh(8)

  rng = np.random.default_rng(1)
  b = 8
  projections = jnp.tile(camera.projection, (b, 1))
  poses = jnp.tile(camera.T_camera_world, (b, 1, 1))
  targets = jnp.asarray(rng.random((b, 32, 32, 3)), jnp.float32)

  loss_fn = data_parallel_loss(mesh, camera, config, max_overlaps=4096)
  sharded = jax.jit(loss_fn)(
      gaussians,
      jax.device_put(projections, NamedSharding(mesh, P("data"))),
      jax.device_put(poses, NamedSharding(mesh, P("data"))),
      jax.device_put(targets, NamedSharding(mesh, P("data"))))

  # single-device reference: mean over cameras
  from tpu_splatting import render_gaussians
  losses = []
  for i in range(b):
    cam = camera.replace(projection=projections[i], T_camera_world=poses[i])
    out = render_gaussians(gaussians, cam, config, max_overlaps=4096)
    losses.append(jnp.mean((out.image - targets[i]) ** 2))
  expected = jnp.mean(jnp.asarray(losses))

  np.testing.assert_allclose(float(sharded), float(expected), rtol=1e-5)


def test_train_step_runs_and_improves():
  gaussians, camera = make_scene()
  config = RasterConfig(tile_size=16, chunk_size=16)
  mesh = make_mesh(8)

  groups = {k: GroupConfig(type="scalar", lr=0.05)
            for k in ["position", "log_scaling", "rotation", "alpha_logit"]}
  groups["feature"] = GroupConfig(type="vector", lr=0.05)

  train_step, optimizer = make_train_step(
      mesh, camera, config, groups, max_overlaps=4096)

  tensors = dict(position=gaussians.position,
                 log_scaling=gaussians.log_scaling,
                 rotation=gaussians.rotation,
                 alpha_logit=gaussians.alpha_logit,
                 feature=gaussians.feature)
  opt_state = optimizer.init(tensors)

  rng = np.random.default_rng(2)
  b = 8
  shard = NamedSharding(mesh, P("data"))
  projections = jax.device_put(jnp.tile(camera.projection, (b, 1)), shard)
  poses = jax.device_put(jnp.tile(camera.T_camera_world, (b, 1, 1)), shard)
  targets = jax.device_put(
      jnp.asarray(rng.random((b, 32, 32, 3)) * 0.1, jnp.float32), shard)

  losses = []
  for _ in range(5):
    tensors, opt_state, loss = train_step(tensors, opt_state, projections,
                                          poses, targets)
    losses.append(float(loss))
  assert all(np.isfinite(losses))
  assert losses[-1] < losses[0], f"loss did not improve: {losses}"


def test_sharded_projection_matches_replicated():
  gaussians, camera = make_scene(n_points=256)
  config = RasterConfig()
  mesh = make_mesh(8)

  proj = jax.jit(sharded_projection(mesh, camera, config))
  g_sharded = jax.device_put(gaussians, NamedSharding(mesh, P("data")))
  points, depth, in_view = proj(g_sharded)

  from tpu_splatting.perspective import project_to_image
  exp_points, exp_depth, exp_iv = project_to_image(gaussians, camera, config)

  # loose tolerance: shard_map compiles a different fusion, and the 2x2
  # eigenvector is ill-conditioned near-isotropic, amplifying f32 rounding
  np.testing.assert_allclose(np.asarray(points), np.asarray(exp_points),
                             rtol=1e-3, atol=5e-3)
  np.testing.assert_array_equal(np.asarray(in_view), np.asarray(exp_iv))
