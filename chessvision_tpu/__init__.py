"""chessvision-tpu: a TPU-native chess position recognition framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
ChessVision-3LC reference (see SURVEY.md): the entire image→FEN hot path —
area resize, UNet segmentation, mask thresholding, quadrangle extraction,
perspective warp, square slicing, and 13-class piece classification — runs
fused and batched on TPU.
"""

from chessvision_tpu import constants
from chessvision_tpu.cv_types import (
    BatchResult,
    BoardExtractionResult,
    ChessVisionResult,
    PositionResult,
    ValidationFix,
    ValidationMetrics,
)

def __getattr__(name: str):
    # Lazy import: ChessVision pulls in jax/flax; keep bare package import
    # cheap for host-only consumers (FEN tools, metrics platform).
    if name == "ChessVision":
        from chessvision_tpu.core import ChessVision

        return ChessVision
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "ChessVision",
    "constants",
    "BatchResult",
    "BoardExtractionResult",
    "ChessVisionResult",
    "PositionResult",
    "ValidationFix",
    "ValidationMetrics",
]

__version__ = "0.1.0"
