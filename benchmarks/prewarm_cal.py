"""Pre-run bench.py's scene calibrations on the host CPU and persist them
in .bench_cal.json, so the driver's bench run never spends its budget on
calibration compiles.  Idempotent: cache hits are no-ops.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prewarm_cal.py [scene...]
Scenes: uniform, heavy, uniform_full (default: all).
"""

from __future__ import annotations

import sys

import numpy as np


def main():
  import jax
  jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
  import dataclasses

  import jax.numpy as jnp

  from bench import (IMAGE_SIZE, N, _cal_cached, _trainer_config,
                     heavy_scene, lift_to_3d, uniform_scene)
  from tpu_splatting.rasterizer.stream import calibrate_stream

  import os
  gw = int(os.environ.get("TPU_SPLAT_GW", "8"))
  config = _trainer_config(gw)
  which = sys.argv[1:] or ["uniform", "heavy", "uniform_full"]
  cpu = jax.devices("cpu")[0]

  scenes = {}
  if "uniform" in which or "uniform_full" in which:
    scenes["uniform"] = uniform_scene(np.random.default_rng(0), N,
                                      IMAGE_SIZE)
  if "heavy" in which:
    scenes["heavy"] = heavy_scene(np.random.default_rng(1), N, IMAGE_SIZE)

  for name in ("uniform", "heavy"):
    if name not in which or name not in scenes:
      continue
    p, d, f = scenes[name]
    cal = _cal_cached(
        f"{name}_gw{gw}",
        lambda p=p, d=d, f=f: calibrate_stream(
            jnp.asarray(p), jnp.asarray(d), jnp.asarray(f), IMAGE_SIZE,
            config, group_width=gw))
    print(f"# {name}: {cal}")

  if "uniform_full" in which:
    from tpu_splatting.perspective.projection import (ndc_depth,
                                                      project_to_image)
    p, d, f = scenes["uniform"]
    g3d, cam = lift_to_3d(p, d, f, IMAGE_SIZE, near=0.1, far=100.0,
                          fov_deg=70.0)

    def compute_cal():
      with jax.default_device(cpu):
        g3c = jax.device_put(jax.device_get(g3d), cpu)
        cac = jax.device_put(jax.device_get(cam), cpu)
        g2d, depths, _ = jax.jit(
            lambda g: project_to_image(g, cac, config))(g3c)
        nd = jnp.where(depths > 0,
                       ndc_depth(depths, cam.near_plane, cam.far_plane),
                       0.0)
        return calibrate_stream(g2d, nd,
                                jax.device_put(jnp.asarray(f), cpu),
                                IMAGE_SIZE, config, group_width=gw)

    cal = _cal_cached(f"uniform_full_gw{gw}", compute_cal)
    print(f"# uniform_full: {cal}")


if __name__ == "__main__":
  main()
