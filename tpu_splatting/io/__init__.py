from .ply import load_gaussians, read_ply_raw, save_gaussians, write_ply_raw

__all__ = ["load_gaussians", "save_gaussians", "read_ply_raw",
           "write_ply_raw"]
