from .tile_mapper import TileMapping, map_to_tiles, pad_to_tile, tile_shape

__all__ = ["TileMapping", "map_to_tiles", "pad_to_tile", "tile_shape"]
