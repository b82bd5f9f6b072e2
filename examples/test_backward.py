"""Minimal backward smoke driver (port of the reference
taichi_splatting/examples/test_backward.py:1-52): render a few large
low-alpha gaussians and pull gradients through the full 2D pipeline."""

from __future__ import annotations

import argparse
from pathlib import Path

import sys
from pathlib import Path as _Path
_ROOT = _Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_splatting.data_types import RasterConfig
from tpu_splatting.misc.renderer2d import render_gaussians


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--n", type=int, default=1)
  parser.add_argument("--tile_size", type=int, default=16)
  args = parser.parse_args(argv)

  from random_data import random_2d_gaussians

  config = RasterConfig(tile_size=args.tile_size)
  image_size = (640, 480)
  rng = np.random.default_rng(0)
  gaussians = random_2d_gaussians(rng, args.n, image_size, scale_factor=10.0,
                                  alpha_range=(0.2, 0.3))

  def loss(g):
    out = render_gaussians(g, image_size, config)
    return jnp.sum(out.image)

  value, grads = jax.value_and_grad(loss)(gaussians)
  for name in ("position", "log_scaling", "rotation", "alpha_logit",
               "feature"):
    g = np.asarray(getattr(grads, name))
    assert np.isfinite(g).all(), f"non-finite gradient in {name}"
    print(f"{name}: |grad| = {np.abs(g).sum():.6f}")
  print(f"loss = {float(value):.6f} — backward OK")


if __name__ == "__main__":
  main()
