"""Tests for the pure-Python chess board / FEN module."""

from chessvision_tpu import constants
from chessvision_tpu.chessboard import (
    SQUARE_NAMES,
    BaseBoard,
    Piece,
    expand_fen,
    fen_to_labels,
    labels_to_fen,
)

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


def test_square_names_indexing() -> None:
    assert SQUARE_NAMES[0] == "a1"
    assert SQUARE_NAMES[7] == "h1"
    assert SQUARE_NAMES[56] == "a8"
    assert SQUARE_NAMES[63] == "h8"
    assert SQUARE_NAMES.index("e4") == 3 * 8 + 4


def test_fen_roundtrip() -> None:
    for fen in [
        START_FEN,
        "8/8/8/8/8/8/8/8",
        "r1bqk2r/pppp1ppp/2n2n2/2b1p3/2B1P3/3P1N2/PPP2PPP/RNBQK2R",
        "4k3/8/8/8/8/8/8/4K3",
    ]:
        assert BaseBoard(fen).board_fen() == fen


def test_set_piece_at() -> None:
    board = BaseBoard(None)
    assert board.board_fen() == "8/8/8/8/8/8/8/8"
    board.set_piece_at(SQUARE_NAMES.index("e4"), Piece.from_symbol("Q"))
    assert board.board_fen() == "8/8/8/8/4Q3/8/8/8"
    board.set_piece_at(SQUARE_NAMES.index("e4"), None)
    assert board.board_fen() == "8/8/8/8/8/8/8/8"


def test_piece_map() -> None:
    board = BaseBoard(START_FEN)
    pm = board.piece_map()
    assert len(pm) == 32
    assert pm[0].symbol == "R"  # a1
    assert pm[63].symbol == "r"  # h8


def test_fen_to_labels_start_position() -> None:
    labels = fen_to_labels(START_FEN)
    assert labels[:8] == ["r", "n", "b", "q", "k", "b", "n", "r"]
    assert labels[8:16] == ["p"] * 8
    assert labels[16:48] == ["f"] * 32
    assert labels[48:56] == ["P"] * 8
    assert labels[56:] == ["R", "N", "B", "Q", "K", "B", "N", "R"]


def test_labels_to_fen_normal_orientation() -> None:
    labels = fen_to_labels(START_FEN)
    fen = labels_to_fen(labels, constants.SQUARE_NAMES_NORMAL)
    assert fen == START_FEN


def test_labels_to_fen_flipped_orientation() -> None:
    # In flipped orientation the first model square is h1, so the label list
    # must be reversed to produce the same position.
    labels = fen_to_labels(START_FEN)
    fen = labels_to_fen(labels[::-1], constants.SQUARE_NAMES_FLIPPED)
    assert fen == START_FEN


def test_expand_fen() -> None:
    expanded = expand_fen(START_FEN)
    assert len(expanded) == 64
    assert expanded[:8] == "rnbqkbnr"
    assert expanded[16:48] == "." * 32


def test_piece_validation() -> None:
    import pytest

    with pytest.raises(ValueError):
        Piece.from_symbol("x")
    with pytest.raises(ValueError):
        BaseBoard("9/8/8/8/8/8/8/8")
