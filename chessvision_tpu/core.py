"""ChessVision: the public single-image facade.

API-compatible with the reference ``ChessVision`` class (reference
core.py:22-567): same constructor signature, same public methods
(``process_image``, ``extract_board``, ``classify_position``,
``process_board_extraction_logits``, ``process_position_probabilities``,
``extract_squares``, ``validate_position``) and same result dataclasses —
but every compute stage dispatches to the fused on-device engine
(chessvision_tpu/engine.py) instead of torch+OpenCV host hops.  For
throughput use ``ChessVision.engine.process_batch`` directly.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chessvision_tpu import constants, models
from chessvision_tpu.chessboard import labels_to_fen
from chessvision_tpu.checkpoint import load_checkpoint
from chessvision_tpu.cv_types import (
    BoardExtractionResult,
    ChessVisionResult,
    PositionResult,
    ValidationFix,
)
from chessvision_tpu.engine import Engine, validate_labels_batch

logger = logging.getLogger(__name__)


# architecture kwargs each model builder accepts — training_config records
# a superset (e.g. the seg trainer always logs base/bilinear even for the
# yolo slot), so filter per model id
_ARCH_KEYS_BY_MODEL = {
    "unet": ("base", "bilinear"),
    "yolo": ("width",),
    "resnet18": ("width", "num_classes"),
}


def _arch_kwargs_from_metadata(metadata: dict, model_id: str) -> dict:
    """Model-architecture kwargs recorded by the trainers
    (training_config), so a checkpoint reconstructs the module it was
    trained with (e.g. a base-32 UNet)."""
    cfg = metadata.get("training_config", {}) if metadata else {}
    allowed = _ARCH_KEYS_BY_MODEL.get(model_id, ())
    return {k: cfg[k] for k in allowed if k in cfg}


def _load_variables(path: str) -> tuple[dict, dict]:
    variables, metadata = load_checkpoint(path)
    variables = dict(variables)
    variables.pop("opt_state", None)
    # a training checkpoint with an EMA view loads like its promoted form
    ema = variables.pop("ema_params", None)
    if ema is not None:
        variables["params"] = ema
    return variables, metadata


class ChessVision:
    """Chess position detection from images, TPU-native."""

    def __init__(
        self,
        board_extractor_weights: str | None = None,
        board_extractor_model_id: str | None = None,
        classifier_weights: str | None = None,
        classifier_model_id: str | None = None,
        lazy_load: bool = True,
        *,
        dtype: Any = jnp.bfloat16,
        mesh: Any = None,
        model_kwargs: dict | None = None,
        refine_grid: str | None = None,
    ) -> None:
        logger.info("Initializing ChessVision instance...")
        from chessvision_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        self._board_extractor: Any = None  # (module, spec, variables)
        self._classifier: Any = None
        # explicit (user-provided) weights win; None means "model default"
        self._explicit_extractor_weights = board_extractor_weights
        self._explicit_classifier_weights = classifier_weights
        self._board_extractor_weights = board_extractor_weights or constants.BEST_EXTRACTOR_WEIGHTS
        self._board_extractor_model_id = board_extractor_model_id
        self._classifier_weights = classifier_weights
        self._classifier_model_id = classifier_model_id
        self._dtype = dtype
        self._mesh = mesh
        self._model_kwargs = model_kwargs or {}
        self._refine_grid = refine_grid
        self._engine: Engine | None = None
        self._extract_jit_cache: dict[tuple, Any] = {}
        self._classify_jit: Any = None

        if not lazy_load:
            logger.info("Eager loading models...")
            self._initialize_board_extractor()
            self._initialize_classifier()
            logger.info("Models loaded successfully")

    # -- model lifecycle --------------------------------------------------------

    def _initialize_board_extractor(self) -> None:
        default = (
            constants.BEST_YOLO_EXTRACTOR
            if self._board_extractor_model_id == "yolo"
            else constants.BEST_EXTRACTOR_WEIGHTS
        )
        path = self._explicit_extractor_weights or default
        kwargs = dict(self._model_kwargs.get("extractor", {}))
        variables = None
        if path and Path(path).exists():
            variables, metadata = _load_variables(path)
            model_id = self._board_extractor_model_id or "unet"
            kwargs = {**_arch_kwargs_from_metadata(metadata, model_id), **kwargs}
            logger.info("Loaded extractor weights from %s", path)
        module, spec = models.create_extractor(self._board_extractor_model_id, dtype=self._dtype, **kwargs)
        if variables is None:
            logger.warning("Weights not found at %s — random init for %s", path, spec.model_id)
            h, w = spec.input_size
            variables = dict(
                module.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, spec.in_channels), jnp.float32))
            )
        self._board_extractor = (module, spec, variables)
        self._board_extractor_weights = path

    def _initialize_classifier(self) -> None:
        default = (
            constants.BEST_YOLO_CLASSIFIER
            if self._classifier_model_id == "yolo"
            else constants.BEST_CLASSIFIER_WEIGHTS
        )
        path = self._explicit_classifier_weights or default
        kwargs = dict(self._model_kwargs.get("classifier", {}))
        variables = None
        if path and Path(path).exists():
            variables, metadata = _load_variables(path)
            model_id = self._classifier_model_id or "resnet18"
            kwargs = {**_arch_kwargs_from_metadata(metadata, model_id), **kwargs}
            logger.info("Loaded classifier weights from %s", path)
        module, spec = models.create_classifier(self._classifier_model_id, dtype=self._dtype, **kwargs)
        if variables is None:
            logger.warning("Weights not found at %s — random init for %s", path, spec.model_id)
            h, w = spec.input_size
            variables = dict(
                module.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, spec.in_channels), jnp.float32))
            )
        self._classifier = (module, spec, variables)
        self._classifier_model_id = spec.model_id
        self._classifier_weights = path

    @property
    def board_extractor(self) -> Any:
        if self._board_extractor is None:
            self._initialize_board_extractor()
        return self._board_extractor

    @property
    def classifier(self) -> Any:
        if self._classifier is None:
            self._initialize_classifier()
        return self._classifier

    @property
    def engine(self) -> Engine:
        """The fused batched engine (builds both models on first access)."""
        if self._engine is None:
            ex_mod, _, ex_vars = self.board_extractor
            cl_mod, cl_spec, cl_vars = self.classifier
            self._engine = Engine(
                ex_mod,
                ex_vars,
                cl_mod,
                cl_vars,
                classifier_outputs_probabilities=cl_spec.outputs_probabilities,
                mesh=self._mesh,
                refine_grid=self._refine_grid,
            )
        return self._engine

    # -- public API (reference-compatible) ---------------------------------------

    def process_image(
        self,
        image: np.ndarray,
        threshold: float = 0.5,
        flip: bool = False,
    ) -> ChessVisionResult:
        """Process a raw BGR image into a validated FEN (reference
        core.py:152-195)."""
        assert isinstance(image, np.ndarray), "Image must be a numpy array"
        assert image.dtype == np.uint8, "Image must be uint8"
        assert len(image.shape) == 3, "Image must be 3-dimensional (H,W,C)"

        start_time = time.time()
        result = self.engine.process_batch(image[None], threshold=threshold, flip=flip)
        found = bool(result.board_found[0])

        board_result = BoardExtractionResult(
            probabilities=result.logits[0],
            binary_mask=result.binary_mask[0],
            quadrangle=result.quadrangle[0] if found else None,
            board_image=result.board_image[0] if found else None,
        )
        position_result = None
        if found:
            squares = ChessVision.extract_squares(result.board_image[0])
            position_result = PositionResult(
                fen=result.fens[0],
                original_fen=result.original_fens[0],
                model_probabilities=result.probabilities[0],
                squares=squares,
                square_names=result.extra["square_names"],
                validation_fixes=result.validation_fixes[0],
            )
        processing_time = time.time() - start_time
        return ChessVisionResult(
            board_extraction=board_result,
            position=position_result,
            processing_time=processing_time,
        )

    def extract_board(self, image: np.ndarray, threshold: float = 0.5) -> BoardExtractionResult:
        """Extract the chessboard from a BGR image (reference core.py:197-223)."""
        result = self.engine.process_batch(image[None], threshold=threshold)
        found = bool(result.board_found[0])
        return BoardExtractionResult(
            probabilities=result.logits[0],
            binary_mask=result.binary_mask[0],
            quadrangle=result.quadrangle[0] if found else None,
            board_image=result.board_image[0] if found else None,
        )

    def classify_position(self, board_image: np.ndarray, flip: bool = False) -> PositionResult:
        """Classify an extracted 512×512 grayscale board (reference
        core.py:225-249)."""
        squares = ChessVision.extract_squares(board_image)
        square_names = constants.SQUARE_NAMES_FLIPPED if flip else constants.SQUARE_NAMES_NORMAL

        if self._classify_jit is None:
            cl_mod, cl_spec, cl_vars = self.classifier

            @jax.jit
            def run(batch: jnp.ndarray) -> jnp.ndarray:
                out = cl_mod.apply(cl_vars, batch)
                if not cl_spec.outputs_probabilities:
                    out = jax.nn.softmax(out, axis=-1)
                return out.astype(jnp.float32)

            self._classify_jit = run

        batch = jnp.asarray(squares, jnp.float32) / 255.0
        probabilities = np.asarray(self._classify_jit(batch))
        return ChessVision.process_position_probabilities(probabilities, square_names, squares)

    def process_board_extraction_logits(
        self,
        logits: np.ndarray,
        orig_image: np.ndarray,
        threshold: float,
    ) -> BoardExtractionResult:
        """Geometry stages from precomputed segmentation logits (reference
        core.py:251-307); useful for testing and enrichment pipelines."""
        from chessvision_tpu.ops import get_perspective_transform, warp_perspective
        from chessvision_tpu.ops.color import bgr_to_gray, create_binary_mask, hflip
        from chessvision_tpu.ops.quad import find_quadrangle, scale_quadrangle

        probabilities = np.asarray(jax.nn.sigmoid(jnp.asarray(logits, jnp.float32)))
        binary_mask = np.asarray(create_binary_mask(jnp.asarray(probabilities), threshold))
        quad, found = find_quadrangle(jnp.asarray(probabilities), threshold)
        if not bool(found):
            return BoardExtractionResult(
                probabilities=logits, binary_mask=binary_mask, quadrangle=None, board_image=None
            )
        scaled = scale_quadrangle(quad, float(orig_image.shape[0]))
        dest = jnp.asarray(
            [[0.0, 0.0], [512.0, 0.0], [512.0, 512.0], [0.0, 512.0]], jnp.float32
        )
        m = get_perspective_transform(scaled, dest)
        gray = bgr_to_gray(jnp.asarray(orig_image, jnp.float32))
        board = hflip(warp_perspective(gray, m, constants.BOARD_SIZE))
        board_u8 = np.asarray(jnp.clip(jnp.floor(board + 0.5), 0, 255).astype(jnp.uint8))
        return BoardExtractionResult(
            probabilities=logits,
            binary_mask=binary_mask,
            quadrangle=np.asarray(scaled),
            board_image=board_u8,
        )

    @staticmethod
    def process_position_probabilities(
        probabilities: np.ndarray,
        square_names: list[str],
        square_crops: np.ndarray,
    ) -> PositionResult:
        """Probabilities → validated position (reference core.py:309-355)."""
        initial = np.argmax(probabilities, axis=1)
        pred_labels = [constants.LABEL_NAMES[p] for p in initial]
        original_fen = labels_to_fen(pred_labels, square_names)

        validated_labels, fixes = ChessVision.validate_position(
            list(pred_labels), probabilities, square_names
        )
        fen = labels_to_fen(validated_labels, square_names)
        return PositionResult(
            fen=fen,
            original_fen=original_fen,
            model_probabilities=probabilities,
            squares=square_crops,
            square_names=square_names,
            validation_fixes=fixes,
        )

    @staticmethod
    def extract_squares(board: np.ndarray) -> np.ndarray:
        """(512, 512) board → (64, 64, 64, 1) squares (reference
        core.py:419-439) — pure numpy reshape/transpose on host."""
        h, w = board.shape
        sh, sw = h // 8, w // 8
        squares = board.reshape(8, sh, 8, sw).transpose(0, 2, 1, 3)
        return squares.reshape(64, sh, sw, 1)

    @staticmethod
    def validate_position(
        pred_labels: list[str],
        probabilities: np.ndarray,
        square_names: list[str],
    ) -> tuple[list[str], list[ValidationFix]]:
        """Chess-rule validation (reference core.py:441-567): no pawns on
        the back ranks — replaced with the next-best non-pawn class."""
        validated, fixes = validate_labels_batch(probabilities[None], square_names)
        # validate_labels_batch works from argmax; splice its result into the
        # caller's label list for exact reference semantics
        out = list(pred_labels)
        for i, lab in enumerate(validated[0]):
            out[i] = lab
        return out, fixes[0]
