"""PLY point-cloud IO (native C++ fast path + numpy fallback).

Loads/saves 3D gaussian scenes in the standard 3DGS PLY checkpoint layout
(x,y,z, nx,ny,nz, f_dc_*, f_rest_*, opacity, scale_*, rot_*), converting to
and from :class:`tpu_splatting.Gaussians3D`.  The bulk parse/de-interleave
runs in ``csrc/ply_io.cpp`` (compiled on first use, ctypes binding); a pure
numpy implementation is the fallback when no compiler is available.

Note on conventions: 3DGS PLY stores quaternions as (w, x, y, z); the
framework uses xyzw (scalar last) — converted here.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_LIB = None
_LIB_FAILED = False


def _build_lib() -> Optional[ctypes.CDLL]:
  global _LIB, _LIB_FAILED
  if _LIB is not None:
    return _LIB
  if _LIB_FAILED:
    return None

  src = Path(__file__).resolve().parents[2] / "csrc" / "ply_io.cpp"
  cache_dir = Path(tempfile.gettempdir()) / "tpu_splatting_native"
  cache_dir.mkdir(exist_ok=True)
  so_path = cache_dir / "ply_io.so"

  try:
    if (not so_path.exists()
        or so_path.stat().st_mtime < src.stat().st_mtime):
      subprocess.run(
          ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(so_path)],
          check=True, capture_output=True)
    lib = ctypes.CDLL(str(so_path))
    lib.ply_inspect.restype = ctypes.c_int64
    lib.ply_inspect.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.c_char_p, ctypes.c_int64]
    lib.ply_read.restype = ctypes.c_int64
    lib.ply_read.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.ply_write.restype = ctypes.c_int64
    lib.ply_write.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.c_char_p]
    lib.ply_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib
  except (subprocess.CalledProcessError, OSError):
    _LIB_FAILED = True
    return None


# ---------------------------------------------------------------------------
# raw property-table IO
# ---------------------------------------------------------------------------


def read_ply_raw(path: str) -> Dict[str, np.ndarray]:
  """Read all float vertex properties as {name: (N,) float32}."""
  lib = _build_lib()
  if lib is not None:
    n_props = ctypes.c_int64()
    names_buf = ctypes.create_string_buffer(1 << 16)
    n = lib.ply_inspect(path.encode(), ctypes.byref(n_props), names_buf,
                        len(names_buf))
    if n < 0:
      raise IOError(f"ply_inspect: {lib.ply_last_error().decode()}")
    names = names_buf.value.decode().split("\n")
    out = np.empty((n_props.value, n), np.float32)
    r = lib.ply_read(path.encode(),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     out.size)
    if r < 0:
      raise IOError(f"ply_read: {lib.ply_last_error().decode()}")
    return {name: out[i] for i, name in enumerate(names)}
  return _read_ply_raw_numpy(path)


def _read_ply_raw_numpy(path: str) -> Dict[str, np.ndarray]:
  names = []
  n = 0
  with open(path, "rb") as f:
    assert f.readline().strip() == b"ply"
    while True:
      line = f.readline()
      if not line:
        raise IOError("missing end_header")
      s = line.decode().strip()
      if s.startswith("format"):
        assert "binary_little_endian" in s, "only binary LE PLY supported"
      elif s.startswith("element vertex"):
        n = int(s.split()[-1])
      elif s.startswith("property float"):
        names.append(s.split()[-1])
      elif s == "end_header":
        break
    data = np.fromfile(f, dtype=np.float32, count=n * len(names))
  data = data.reshape(n, len(names))
  return {name: np.ascontiguousarray(data[:, i])
          for i, name in enumerate(names)}


def write_ply_raw(path: str, props: Dict[str, np.ndarray]):
  names = list(props.keys())
  n = len(next(iter(props.values())))
  lib = _build_lib()
  table = np.ascontiguousarray(
      np.stack([np.asarray(props[k], np.float32) for k in names]))
  if lib is not None:
    r = lib.ply_write(path.encode(),
                      table.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      n, len(names), "\n".join(names).encode())
    if r < 0:
      raise IOError(f"ply_write: {lib.ply_last_error().decode()}")
    return
  with open(path, "wb") as f:
    f.write(b"ply\nformat binary_little_endian 1.0\n")
    f.write(f"element vertex {n}\n".encode())
    for name in names:
      f.write(f"property float {name}\n".encode())
    f.write(b"end_header\n")
    table.T.astype("<f4").tofile(f)


# ---------------------------------------------------------------------------
# Gaussians3D <-> 3DGS PLY layout
# ---------------------------------------------------------------------------


def load_gaussians(path: str):
  """Load a 3DGS checkpoint PLY into Gaussians3D (SH feature layout)."""
  import jax.numpy as jnp
  from ..data_types import Gaussians3D

  props = read_ply_raw(path)
  n = len(props["x"])

  position = np.stack([props["x"], props["y"], props["z"]], 1)
  log_scaling = np.stack(
      [props[f"scale_{i}"] for i in range(3)], 1)
  # 3DGS rot_* is (w, x, y, z); convert to xyzw
  rot_wxyz = np.stack([props[f"rot_{i}"] for i in range(4)], 1)
  rotation = np.concatenate([rot_wxyz[:, 1:4], rot_wxyz[:, 0:1]], 1)
  alpha_logit = props["opacity"][:, None]

  dc = np.stack([props[f"f_dc_{i}"] for i in range(3)], 1)   # (N, 3)
  rest_names = sorted(
      (k for k in props if k.startswith("f_rest_")),
      key=lambda s: int(s.split("_")[-1]))
  if rest_names:
    rest = np.stack([props[k] for k in rest_names], 1)       # (N, 3*(B-1))
    b = len(rest_names) // 3 + 1
    feature = np.concatenate(
        [dc[:, :, None], rest.reshape(n, 3, b - 1)], 2)      # (N, 3, B)
  else:
    feature = dc[:, :, None]

  return Gaussians3D(
      position=jnp.asarray(position),
      log_scaling=jnp.asarray(log_scaling),
      rotation=jnp.asarray(rotation),
      alpha_logit=jnp.asarray(alpha_logit),
      feature=jnp.asarray(feature),
  )


def save_gaussians(path: str, gaussians):
  """Save Gaussians3D to the standard 3DGS PLY layout."""
  pos = np.asarray(gaussians.position, np.float32)
  n = pos.shape[0]
  feature = np.asarray(gaussians.feature, np.float32)
  if feature.ndim == 2:
    feature = feature[:, :, None]
  b = feature.shape[2]

  rot = np.asarray(gaussians.rotation, np.float32)
  rot_wxyz = np.concatenate([rot[:, 3:4], rot[:, 0:3]], 1)

  props = {
      "x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2],
      "nx": np.zeros(n, np.float32), "ny": np.zeros(n, np.float32),
      "nz": np.zeros(n, np.float32),
  }
  for i in range(3):
    props[f"f_dc_{i}"] = feature[:, i, 0]
  for j in range(b - 1):
    for i in range(3):
      props[f"f_rest_{i * (b - 1) + j}"] = feature[:, i, j + 1]
  props["opacity"] = np.asarray(gaussians.alpha_logit, np.float32)[:, 0]
  for i in range(3):
    props[f"scale_{i}"] = np.asarray(gaussians.log_scaling,
                                     np.float32)[:, i]
  for i in range(4):
    props[f"rot_{i}"] = rot_wxyz[:, i]

  write_ply_raw(path, props)
