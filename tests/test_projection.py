"""Projection tests: f64 gradcheck + comparison against an independent
matrix-form implementation (mirrors reference tests/test_projection.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradcheck import check_grads

from tpu_splatting import RasterConfig
from tpu_splatting.perspective import project_to_image
from tpu_splatting.perspective.projection import project_gaussians
from tpu_splatting.ref_lib import reference_project

from random_data import random_3d_gaussians, random_camera


def make_inputs(seed, n=20, dtype=jnp.float64):
  rng = np.random.default_rng(seed)
  camera = random_camera(rng, dtype=dtype)
  gaussians = random_3d_gaussians(rng, n, camera, dtype=dtype)
  return gaussians, camera


@pytest.mark.parametrize("seed", range(10))
def test_projection_matches_reference(seed):
  gaussians, camera = make_inputs(seed)
  config = RasterConfig()

  points, depth, in_view = project_to_image(gaussians, camera, config)

  ref_points, ref_z = reference_project(
      *gaussians.shape_tensors(), camera.T_camera_world, camera.projection,
      camera.image_size, config.clamp_margin, config.blur_cov)

  mask = np.asarray(in_view)
  assert mask.any(), "test scene should have visible points"

  np.testing.assert_allclose(
      np.asarray(points)[mask], np.asarray(ref_points)[mask],
      rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(
      np.asarray(depth)[mask, 0], np.asarray(ref_z)[mask],
      rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("seed", range(10))
def test_projection_gradcheck(seed):
  gaussians, camera = make_inputs(seed, n=10)
  config = RasterConfig()

  _, _, in_view = project_to_image(gaussians, camera, config)
  mask = jnp.asarray(in_view)

  def f(position, log_scaling, rotation, alpha_logit, T_camera_world,
        projection):
    points, depth, _ = project_gaussians(
        position, log_scaling, rotation, alpha_logit, T_camera_world,
        projection, camera.image_size, camera.depth_range,
        blur_cov=config.blur_cov, clamp_margin=config.clamp_margin,
        alpha_threshold=config.alpha_threshold)
    # only compare on the stably-visible subset
    return (points * mask[:, None], depth * mask[:, None])

  args = (*gaussians.shape_tensors(), camera.T_camera_world,
          camera.projection)
  check_grads(f, args, order=1, modes=["rev"],
                            rtol=1e-6, atol=1e-6)


def test_culling_behind_camera():
  """Points behind the camera are masked with zeroed outputs."""
  gaussians, camera = make_inputs(0, n=50)

  # place every point at camera-space z = -5 (behind the camera)
  r = camera.T_camera_world[:3, :3]
  t = camera.T_camera_world[:3, 3]
  cam_space = jnp.asarray(np.random.default_rng(1).standard_normal((50, 3)),
                          dtype=jnp.float64)
  cam_space = cam_space.at[:, 2].set(-5.0)
  behind = gaussians.replace(position=(cam_space - t) @ r)

  points, depth, in_view = project_to_image(behind, camera, RasterConfig())
  assert not bool(jnp.any(in_view))
  assert np.all(np.asarray(points) == 0)
  assert np.all(np.asarray(depth) == 0)
