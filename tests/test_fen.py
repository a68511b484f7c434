"""FEN / display-string / notation codec tests.

Golden cases transcribed from the reference suites at
``game/board/state.rs:353-451`` and ``game/tiles.rs:275-325``.
"""

import numpy as np
import pytest

from alphazeroforhnefatafl_tpu.core import fen
from alphazeroforhnefatafl_tpu.core.rules import BOARDS, CELL_ATT, CELL_DEF, CELL_KING


def test_fen_display_round_trip():
    # game/board/state.rs:353-372
    from_fen = fen.board_from_fen("3t3/3t3/3T3/ttTKTtt/3T3/3t3/3t3")
    from_display = fen.board_from_display_str(
        "\n".join(
            [
                "...t...",
                "...t...",
                "...T...",
                "ttTKTtt",
                "...T...",
                "...t...",
                "...t...",
            ]
        )
    )
    assert np.array_equal(from_fen, from_display)
    assert fen.board_to_fen(from_fen) == "3t3/3t3/3T3/ttTKTtt/3T3/3t3/3t3"


def test_piece_movement_fen():
    # game/board/state.rs:374-404
    board = fen.board_from_fen("3t3/3t3/3T3/ttTKTtt/3T3/3t3/3t3")
    assert np.argwhere(board == CELL_KING).tolist() == [[3, 3]]
    board[1, 5] = CELL_ATT
    board[4, 1] = CELL_DEF
    board[0, 4] = board[3, 3]
    board[3, 3] = 0
    assert fen.board_to_fen(board) == "3tK2/3t1t1/3T3/ttT1Ttt/1T1T3/3t3/3t3"
    for t in [(0, 3), (2, 3), (0, 4)]:
        assert board[t] != 0
    for t in [(3, 3), (5, 4), (1, 1)]:
        assert board[t] == 0


def test_copenhagen_counts():
    # game/board/state.rs:446-451
    board = fen.board_from_fen(BOARDS.COPENHAGEN)
    assert int(np.sum(board == CELL_ATT)) == 24
    assert int(np.sum((board == CELL_DEF) | (board == CELL_KING))) == 13


def test_multi_digit_empty_runs():
    board = fen.board_from_fen(BOARDS.COPENHAGEN)
    assert board.shape == (11, 11)
    assert np.all(board[2] == 0)  # the "11" rank


def test_ragged_fen_raises():
    with pytest.raises(fen.ParseError):
        fen.board_from_fen("3t3/3t2/3T3/ttTKTtt/3T3/3t3/3t3")


def test_tile_notation():
    # game/tiles.rs:275-292
    assert fen.tile_from_str("a8") == (7, 0)
    assert fen.tile_to_str(7, 0) == "a8"
    assert fen.tile_from_str("f14") == (13, 5)
    assert fen.tile_to_str(13, 5) == "f14"
    with pytest.raises(fen.ParseError):
        fen.tile_from_str("")
    with pytest.raises(fen.ParseError):
        fen.tile_from_str("[53")
    with pytest.raises(fen.ParseError):
        fen.tile_from_str("a!!")


def test_play_notation():
    # game/tiles.rs:294-325
    assert fen.play_from_str("a8-a11") == ((7, 0), (10, 0))
    assert fen.play_to_str((7, 0), (10, 0)) == "a8-a11"
    assert fen.play_from_str("f5-d5") == ((4, 5), (4, 3))
    with pytest.raises(fen.ParseError):
        fen.play_from_str("f5-d6")  # disjoint
    with pytest.raises(fen.ParseError):
        fen.play_from_str("f5-d7-d6")
    with pytest.raises(fen.ParseError):
        fen.play_from_str("f5-d]")
    with pytest.raises(fen.ParseError):
        fen.play_from_str("!5-d5")


def test_extended_piece_chars_fold_to_side_soldiers():
    """game/pieces.rs:100-141: n/c/g/m parse as their side's piece; the
    bitfield board stores only side + king (board/state.rs:116-147), so they
    fold to soldier planes — lowercase attacker, uppercase defender."""
    from alphazeroforhnefatafl_tpu.core.rules import CELL_ATT, CELL_DEF, CELL_KING

    board = fen.board_from_fen("ncgm1/NCGM1/2K2/5/5")
    assert (board[0, :4] == CELL_ATT).all()
    assert (board[1, :4] == CELL_DEF).all()
    assert board[2, 2] == CELL_KING
    # Attacker 'k' folds to an attacker soldier (only the defender king is
    # representable, as in the reference's king nibble).
    board2 = fen.board_from_fen("k4/5/2K2/5/5")
    assert board2[0, 0] == CELL_ATT
    with pytest.raises(fen.ParseError):
        fen.board_from_fen("x4/5/5/5/5")
