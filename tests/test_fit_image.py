"""End-to-end training smoke test: the fit_image_gaussians example must
converge (the reference's own correctness north-star, BASELINE.json config
'fit_image_gaussians on a single test image')."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_fit_image_gaussians_smoke():
  """Fast tier: the trainer runs end-to-end and makes progress."""
  from examples.fit_image_gaussians import main

  psnr = main(["--n", "120", "--iters", "10", "--epoch", "5",
               "--max_epoch", "5", "--image_size", "48,32",
               "--max_overlaps", "4096"])
  assert psnr > 10, f"training made no progress: PSNR {psnr}"


@pytest.mark.slow
def test_fit_image_gaussians_converges():
  from examples.fit_image_gaussians import main

  psnr = main(["--n", "200", "--iters", "40", "--epoch", "10",
               "--max_epoch", "20", "--image_size", "64,48", "--prune",
               "--max_overlaps", "16384", "--debug"])
  assert psnr > 15, f"training failed to converge: PSNR {psnr}"


@pytest.mark.slow
def test_fit_image_gaussians_antialias():
  from examples.fit_image_gaussians import main

  psnr = main(["--n", "100", "--iters", "20", "--epoch", "10",
               "--image_size", "48,32", "--antialias",
               "--max_overlaps", "8192"])
  assert psnr > 12, f"antialias training failed: PSNR {psnr}"
