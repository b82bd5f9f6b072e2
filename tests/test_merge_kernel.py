"""Direct unit tests for the gradient-slab merge kernel.

merge_grad_slabs sums the backward's 9 per-class (band b, in-group k)
gradient slabs into canonical home-major rows (the role the reference
fills with atomic adds inside its rasterizer backward,
reference taichi_splatting/rasterizer/backward_kernel.py).  The
end-to-end gradchecks in test_stream.py exercise it through the whole
pipeline; these tests pin its summation semantics in isolation against
a direct numpy model, across band/group edge cases (few bands, chunk
boundaries, halo mode) that a single scene cannot cover all at once.
"""

import types

import numpy as np
import pytest

from tpu_splatting.rasterizer.stream_kernels import merge_grad_slabs


def _ref_merge(gout, th, groups_x, gw, rc, slabw, halo):
  """Numpy model: per output band o, home j sums class-(b, k) slabs
  from source band o + 1 - b (ext row o + 2 - b in halo mode), with the
  left/right neighbour rows at group edges."""
  lanes = gout.shape[2]
  assert lanes == 9 * slabw
  n_groups = th * groups_x
  out = np.zeros((slabw, n_groups * gw * rc), gout.dtype)
  n_src_bands = th + 2 if halo else th
  for band in range(th):
    for gx in range(groups_x):
      for j in range(gw):
        acc = np.zeros((rc, lanes), gout.dtype)
        for b in range(3):
          sb = band + (2 if halo else 1) - b
          if not halo and not (0 <= sb < th):
            continue
          assert 0 <= sb < n_src_bands
          src = sb * groups_x + gx
          for k in range(3):
            if 0 <= j + 1 - k < gw:
              lo, hi = (b * 3 + k) * slabw, (b * 3 + k + 1) * slabw
              acc[:, lo:hi] += gout[src, (j + 1) * rc:(j + 2) * rc,
                                    lo:hi]
          if j == 0 and gx > 0:
            lo, hi = (b * 3 + 2) * slabw, (b * 3 + 3) * slabw
            acc[:, lo:hi] += gout[src - 1, (gw + 1) * rc:(gw + 2) * rc,
                                  lo:hi]
          if j == gw - 1 and gx < groups_x - 1:
            lo, hi = (b * 3 + 0) * slabw, (b * 3 + 1) * slabw
            acc[:, lo:hi] += gout[src + 1, 0:rc, lo:hi]
        row0 = ((band * groups_x + gx) * gw + j) * rc
        for cc in range(slabw):
          out[cc, row0:row0 + rc] = acc[:, cc::slabw].sum(1)
  return out


@pytest.mark.parametrize("th,groups_x,gw,rc,slabw,halo", [
    (4, 4, 8, 64, 12, False),   # chunk interior + band clipping
    (2, 2, 8, 64, 12, False),   # fewer bands than the 3-band stencil
    (1, 4, 4, 64, 10, False),   # single band, gw=4
    (3, 4, 8, 64, 12, True),    # halo: th+2 source ext rows
    (5, 8, 8, 64, 13, False),   # multi-chunk when cpg < groups_x
])
def test_merge_matches_numpy(th, groups_x, gw, rc, slabw, halo):
  rng = np.random.default_rng(th * 100 + groups_x + gw + slabw)
  n_src = (th + 2 if halo else th) * groups_x
  slack = 16
  gout = rng.normal(size=(n_src, (gw + 2) * rc + slack,
                          9 * slabw)).astype(np.float32)
  mapping = types.SimpleNamespace(group_width=gw, tiles_wide=groups_x * gw,
                                  tiles_high=th)
  cols = merge_grad_slabs(gout, mapping, rc, slabw, halo=halo)
  got = np.stack([np.asarray(c) for c in cols])
  want = _ref_merge(gout, th, groups_x, gw, rc, slabw, halo)
  np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
