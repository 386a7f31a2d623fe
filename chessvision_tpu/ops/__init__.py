"""TPU-native image ops: the OpenCV replacements on the hot path.

Every op here is jittable, batched, and shaped for TPU: resizes are
separable matmuls (MXU), warps are homography solves + bilinear gathers,
color conversion matches cv2's fixed-point grayscale. Golden-tested against
OpenCV on CPU (tests/test_ops_*.py). Replaces reference usage documented in
SURVEY.md §2.4.
"""

from chessvision_tpu.ops.color import bgr_to_gray, create_binary_mask, hflip
from chessvision_tpu.ops.resize import resize, resize_matrices
from chessvision_tpu.ops.squares import extract_squares, extract_squares_batch
from chessvision_tpu.ops.warp import (
    get_perspective_transform,
    invert_homography,
    warp_perspective,
)

__all__ = [
    "bgr_to_gray",
    "create_binary_mask",
    "hflip",
    "resize",
    "resize_matrices",
    "extract_squares",
    "extract_squares_batch",
    "get_perspective_transform",
    "invert_homography",
    "warp_perspective",
]
