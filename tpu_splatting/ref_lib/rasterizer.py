"""Rasterization oracle (re-export).

The sequential per-pixel compositing oracle lives next to the kernels it
validates; re-exported here so the whole ground-truth layer is one package
(parity with the reference torch_lib layout).
"""

from ..rasterizer.reference import rasterize_reference

__all__ = ["rasterize_reference"]
