"""Layout transforms: blocking, reference output layouts, zigzag, color."""

from .blocks import BLOCK, blockize, unblockize
from .reorder import (
    coeffs_to_buffer, buffer_to_coeffs,
    block_contiguous, block_contiguous_inverse,
    pair_cells, pair_cells_inverse,
    group8, group8_inverse,
    planar_stereo, planar_stereo_inverse,
)
from .zigzag import zigzag_order, zigzag_inverse_order, to_zigzag, from_zigzag
from .color import (
    BASE_CHROMA_QUANT_TABLE,
    rgb_to_planar, planar_to_rgb, rgb_to_ycbcr, ycbcr_to_rgb,
)
from .stereo import split_views, stack_views, top_view

__all__ = [
    "BLOCK", "blockize", "unblockize",
    "coeffs_to_buffer", "buffer_to_coeffs",
    "block_contiguous", "block_contiguous_inverse",
    "pair_cells", "pair_cells_inverse",
    "group8", "group8_inverse",
    "planar_stereo", "planar_stereo_inverse",
    "zigzag_order", "zigzag_inverse_order", "to_zigzag", "from_zigzag",
    "BASE_CHROMA_QUANT_TABLE",
    "rgb_to_planar", "planar_to_rgb", "rgb_to_ycbcr", "ycbcr_to_rgb",
    "split_views", "stack_views", "top_view",
]
