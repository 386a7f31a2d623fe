"""ChessVision facade tests — mirrors the reference's tests/test_chessvision.py
(initialization, process_image, extract_board, classify_position,
extract_squares) but runs without trained weights by using small random-init
models where the reference tests require checkpoints."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from chessvision_tpu import ChessVision, constants

TEST_IMAGE = (
    Path(constants.DATA_ROOT) / "test" / "initial" / "raw" / "1bf29f73-bc30-448b-a894-bd6428754a0c.JPG"
)

SMALL = {"extractor": {"width": 8}, "classifier": {"width": 8}}


@pytest.fixture(scope="module")
def cv_model(tmp_path_factory) -> ChessVision:
    # explicit nonexistent weight paths force random init regardless of
    # what trained weights are present in weights/
    missing = str(tmp_path_factory.mktemp("w") / "none.npz")
    return ChessVision(
        board_extractor_weights=missing,
        board_extractor_model_id="yolo",
        classifier_weights=missing,
        classifier_model_id="yolo",
        dtype=jnp.float32,
        model_kwargs=SMALL,
    )


@pytest.fixture(scope="module")
def test_image() -> np.ndarray:
    import cv2

    if not TEST_IMAGE.exists():
        pytest.skip(f"Test image not found at {TEST_IMAGE}")
    return cv2.imread(str(TEST_IMAGE))


def test_chessvision_initialization() -> None:
    cv = ChessVision()
    assert cv._board_extractor is None  # lazy
    assert cv._classifier is None
    assert cv._board_extractor_weights == constants.BEST_EXTRACTOR_WEIGHTS
    assert cv._classifier_weights is None

    custom_extractor = "path/to/extractor.npz"
    custom_classifier = "path/to/classifier.npz"
    cv = ChessVision(
        board_extractor_weights=custom_extractor,
        classifier_weights=custom_classifier,
    )
    assert cv._board_extractor_weights == custom_extractor
    assert cv._classifier_weights == custom_classifier


def test_process_image(cv_model: ChessVision, test_image: np.ndarray) -> None:
    result = cv_model.process_image(test_image)
    assert result is not None
    assert result.board_extraction is not None
    assert isinstance(result.board_extraction.binary_mask, np.ndarray)
    assert result.board_extraction.binary_mask.dtype == np.uint8

    if result.board_extraction.board_image is not None:
        assert result.position is not None
        assert result.position.fen is not None
        assert result.position.original_fen is not None
        assert result.position.model_probabilities is not None
        assert result.position.squares is not None
        assert result.position.square_names is not None
        assert result.position.validation_fixes is not None
    else:
        assert result.position is None

    assert result.processing_time > 0


def test_extract_board(cv_model: ChessVision, test_image: np.ndarray) -> None:
    result = cv_model.extract_board(test_image)
    assert result is not None
    assert isinstance(result.binary_mask, np.ndarray)
    assert result.binary_mask.dtype == np.uint8
    assert result.binary_mask.shape == (256, 256)
    if result.board_image is not None:
        assert result.board_image.shape == (512, 512)
        assert result.quadrangle is not None


def test_classify_position(cv_model: ChessVision, test_image: np.ndarray) -> None:
    board = np.random.default_rng(0).integers(0, 256, (512, 512), np.uint8)
    result = cv_model.classify_position(board)
    assert result.fen is not None
    assert result.original_fen is not None
    assert result.model_probabilities.shape == (64, 13)
    assert result.squares.shape == (64, 64, 64, 1)
    assert result.square_names == constants.SQUARE_NAMES_NORMAL
    if result.validation_fixes:
        assert result.original_fen != result.fen
    else:
        assert result.original_fen == result.fen
    for fix in result.validation_fixes:
        assert fix.square_name in result.square_names
        assert fix.original_piece in constants.LABEL_NAMES
        assert fix.corrected_piece in constants.LABEL_NAMES
        assert isinstance(fix.rule_name, str)


def test_extract_squares() -> None:
    board = np.zeros((512, 512), dtype=np.uint8)
    square_size = 64
    for rank in range(8):
        for file in range(8):
            value = rank * 8 + file
            board[
                rank * square_size : (rank + 1) * square_size,
                file * square_size : (file + 1) * square_size,
            ] = value
    squares = ChessVision.extract_squares(board)
    assert squares.shape == (64, 64, 64, 1)
    assert squares[0, 0, 0, 0] == 0  # a8
    assert squares[7, 0, 0, 0] == 7  # h8
    assert squares[56, 0, 0, 0] == 56  # a1
    assert squares[63, 0, 0, 0] == 63  # h1
    assert squares[8, 0, 0, 0] == 8  # a7
    assert squares[15, 0, 0, 0] == 15  # h7


def test_process_board_extraction_logits(cv_model: ChessVision, test_image: np.ndarray) -> None:
    """Deterministic geometry path from synthetic logits."""
    import cv2

    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.int32)
    mask = np.zeros((256, 256), np.uint8)
    cv2.fillConvexPoly(mask, quad, 255)
    logits = np.where(mask > 0, 8.0, -8.0).astype(np.float32)

    result = cv_model.process_board_extraction_logits(logits, test_image, 0.5)
    assert result.board_image is not None
    assert result.board_image.shape == (512, 512)
    assert result.quadrangle is not None
    # quad scaled by H/256 = 2 for the 512x512 test image
    assert 55 <= result.quadrangle[:, 0].min() <= 70

    # not-found path
    result2 = cv_model.process_board_extraction_logits(
        np.full((256, 256), -8.0, np.float32), test_image, 0.5
    )
    assert result2.board_image is None
    assert result2.quadrangle is None
