"""Golden rules tests for the Python oracle engine.

Every test here is a transcription of a reference inline test, cited by
file:line into ``/root/reference``. The oracle is the behavioral spec the JAX
environment is differentially tested against, so this suite pins the spec.
"""

import numpy as np
import pytest

from alphazeroforhnefatafl_tpu.core import fen
from alphazeroforhnefatafl_tpu.core.oracle import Game, GameLogic, GameState, InvalidPlayError, Play, RepetitionTracker
from alphazeroforhnefatafl_tpu.core.rules import (
    BOARDS,
    BRANDUBH,
    COPENHAGEN,
    TABLUT,
    DrawReason,
    HostilityRules,
    PieceSet,
    PieceType,
    PlayInvalid,
    RepetitionRule,
    ShieldwallRules,
    Side,
    ThroneRule,
    WinReason,
)

# Ruleset { slow_pieces: King, throne_movement: NoPass, ..BRANDUBH }
# (game/game/logic.rs:904-908)
TEST_RULES = BRANDUBH.with_(
    slow_pieces=PieceSet.from_piece_type(PieceType.KING),
    throne_movement=ThroneRule.NO_PASS,
)


def P(src, dst):
    return Play.from_tiles(src, dst)


def assert_valid(logic, play, state):
    assert logic.validate_play(play, state) is None


def assert_invalid(logic, play, state, reason):
    assert logic.validate_play(play, state) == reason


class TestPlayValidity:
    """game/game/logic.rs:923-1013 (generic_test_play_validity)."""

    def test_play_validity(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen(BOARDS.BRANDUBH, BRANDUBH.starting_side)

        assert_valid(logic, P((3, 1), (4, 1)), state)
        assert_invalid(logic, P((0, 3), (0, 0)), state, PlayInvalid.MOVE_ONTO_BLOCKED_TILE)
        assert_invalid(logic, P((1, 1), (2, 1)), state, PlayInvalid.NO_PIECE)
        assert_invalid(logic, P((0, 3), (0, 7)), state, PlayInvalid.OUT_OF_BOUNDS)
        assert_invalid(logic, P((0, 3), (2, 3)), state, PlayInvalid.BLOCKED_BY_PIECE)

        state, _, _ = logic.do_play(P((3, 1), (4, 1)), state)
        assert_invalid(logic, P((3, 3), (3, 2)), state, PlayInvalid.BLOCKED_BY_PIECE)

        # Direct board mutations (logic.rs:974-975)
        state.board[4, 2] = state.board[3, 2]
        state.board[3, 2] = 0
        state.board[3, 2] = state.board[3, 3]
        state.board[3, 3] = 0
        assert_invalid(logic, P((2, 3), (3, 3)), state, PlayInvalid.MOVE_ONTO_BLOCKED_TILE)
        assert_valid(logic, P((3, 2), (3, 3)), state)

        logic = GameLogic(TEST_RULES, 7)
        state = GameState.from_fen("7/5Tt/2T4/2t2t1/Tt4T/2t4/2T2K1", Side.DEFENDER)
        assert_invalid(logic, P((6, 5), (6, 3)), state, PlayInvalid.TOO_FAR)
        assert_valid(logic, P((6, 5), (6, 4)), state)

        state.side_to_play = Side.ATTACKER
        assert_invalid(logic, P((3, 2), (3, 4)), state, PlayInvalid.MOVE_THROUGH_BLOCKED_TILE)

    def test_game_over_invalid(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen(BOARDS.BRANDUBH, Side.ATTACKER)
        from alphazeroforhnefatafl_tpu.core.oracle import Outcome

        state.outcome = Outcome.win(WinReason.KING_ESCAPED, Side.DEFENDER)
        assert_invalid(logic, P((3, 1), (4, 1)), state, PlayInvalid.GAME_OVER)


class TestPlayOutcome:
    """game/game/logic.rs:1023-1087 (generic_test_play_outcome)."""

    FEN = "4t2/5Tt/2T4/2t2t1/Tt4T/2t4/2T2K1"

    def _proto(self):
        return GameLogic(TEST_RULES, 7), GameState.from_fen(self.FEN, TEST_RULES.starting_side)

    def test_king_capture(self):
        logic, state = self._proto()
        play = P((0, 4), (6, 4))
        # get_captures on a board with the play already applied
        probe = state.copy()
        probe.board[6, 4] = probe.board[0, 4]
        probe.board[0, 4] = 0
        from alphazeroforhnefatafl_tpu.core.rules import ATT_SOLDIER

        caps = logic.get_captures(play, ATT_SOLDIER, probe)
        assert caps == {(6, 5)}
        new_state, caps, outcome = logic.do_play(play, state)
        assert outcome is not None
        assert outcome.winner == Side.ATTACKER
        assert outcome.win_reason == WinReason.KING_CAPTURED

    def test_triple_capture(self):
        logic, state = self._proto()
        state.side_to_play = Side.DEFENDER
        play = P((4, 6), (4, 2))
        probe = state.copy()
        probe.board[4, 2] = probe.board[4, 6]
        probe.board[4, 6] = 0
        from alphazeroforhnefatafl_tpu.core.rules import DEF_SOLDIER

        caps = logic.get_captures(play, DEF_SOLDIER, probe)
        assert caps == {(4, 1), (3, 2), (5, 2)}
        _, _, outcome = logic.do_play(play, state)
        assert outcome is None

    def test_king_escape(self):
        logic, state = self._proto()
        state.side_to_play = Side.DEFENDER
        _, caps, outcome = logic.do_play(P((6, 5), (6, 6)), state)
        assert caps == set()
        assert outcome is not None
        assert outcome.winner == Side.DEFENDER
        assert outcome.win_reason == WinReason.KING_ESCAPED

    def test_no_outcome(self):
        logic, state = self._proto()
        state.side_to_play = Side.DEFENDER
        _, caps, outcome = logic.do_play(P((6, 5), (5, 5)), state)
        assert caps == set()
        assert outcome is None


class TestShieldwalls:
    """game/game/logic.rs:1089-1169."""

    NO_CORNER_RULES = COPENHAGEN.with_(
        shieldwall=ShieldwallRules(
            corners_may_close=False, captures=PieceSet.from_piece_type(PieceType.SOLDIER)
        )
    )
    KING_CAPTURE_RULES = COPENHAGEN.with_(
        shieldwall=ShieldwallRules(corners_may_close=False, captures=PieceSet.all())
    )

    CORNER_SW = "9/9/9/9/6t2/7tT/7tT/7tT/9"
    REGULAR_SW = "9/9/9/6t2/7tT/7tT/7tT/8t/9"
    REGULAR_SW_KING = "9/9/9/6t2/7tT/7tK/7tT/8t/9"
    NO_SW_GAP = "9/9/9/6t2/7tT/8T/7tT/8t/9"
    NO_SW_FRIEND = "9/9/9/6t2/7tT/6tTT/7tT/8t/9"
    NO_SW_SMALL = "9/9/9/6t2/7tT/8t/9/9/9"

    CM = P((4, 6), (4, 8))
    M = P((3, 6), (3, 8))
    N = P((3, 6), (3, 7))

    def test_corner_close(self):
        logic = GameLogic(COPENHAGEN, 9)
        state = GameState.from_fen(self.CORNER_SW, Side.ATTACKER)
        assert logic.detect_shieldwall(self.N, state) is None
        assert logic.detect_shieldwall(self.CM, state) == {(5, 8), (6, 8), (7, 8)}

    def test_no_corner_close(self):
        logic = GameLogic(self.NO_CORNER_RULES, 9)
        state = GameState.from_fen(self.CORNER_SW, Side.ATTACKER)
        assert logic.detect_shieldwall(self.M, state) is None

    def test_regular(self):
        logic = GameLogic(self.NO_CORNER_RULES, 9)
        state = GameState.from_fen(self.REGULAR_SW, Side.ATTACKER)
        assert logic.detect_shieldwall(self.M, state) == {(4, 8), (5, 8), (6, 8)}

    def test_king_not_captured(self):
        logic = GameLogic(self.NO_CORNER_RULES, 9)
        state = GameState.from_fen(self.REGULAR_SW_KING, Side.ATTACKER)
        assert logic.detect_shieldwall(self.M, state) == {(4, 8), (6, 8)}

    def test_king_captured_when_allowed(self):
        logic = GameLogic(self.KING_CAPTURE_RULES, 9)
        state = GameState.from_fen(self.REGULAR_SW_KING, Side.ATTACKER)
        assert logic.detect_shieldwall(self.M, state) == {(4, 8), (5, 8), (6, 8)}

    def test_negatives(self):
        logic = GameLogic(self.NO_CORNER_RULES, 9)
        for s in [self.NO_SW_GAP, self.NO_SW_FRIEND, self.NO_SW_SMALL]:
            state = GameState.from_fen(s, Side.ATTACKER)
            assert logic.detect_shieldwall(self.M, state) is None


class TestEnclosureSecure:
    """game/game/logic.rs:1171-1213 (test_encl_secure)."""

    SETUP_1 = "7/2ttt2/1t1K1t1/2ttt2/7"
    SETUP_2 = "7/1tttt2/1t1K1t1/2tttt1/7"
    SETUP_3 = "2t1t2/1t1t1t1/1t1K1t1/2ttt2/7"
    SETUP_4 = "2t2t1/1t3t1/1t1K1t1/2ttt2/7"

    SAFE_CORNERS = COPENHAGEN.with_(
        hostility=HostilityRules(
            corners=PieceSet.none(), edge=PieceSet.none(), throne=PieceSet.none()
        )
    )

    @pytest.mark.parametrize(
        "setup,inside_safe,outside_safe,is_secure,rules",
        [
            (SETUP_1, False, True, True, COPENHAGEN),
            (SETUP_1, False, False, False, COPENHAGEN),
            (SETUP_2, False, True, True, COPENHAGEN),
            (SETUP_2, True, False, True, COPENHAGEN),
            (SETUP_3, False, True, False, COPENHAGEN),
            (SETUP_4, False, True, False, COPENHAGEN),
            (SETUP_4, False, True, True, SAFE_CORNERS),
            (SETUP_4, True, False, True, COPENHAGEN),
        ],
    )
    def test_matrix(self, setup, inside_safe, outside_safe, is_secure, rules):
        logic = GameLogic(rules, 7)
        state = GameState.from_fen(setup, rules.starting_side)
        from alphazeroforhnefatafl_tpu.core.rules import ATT_SOLDIER

        encl = logic.find_enclosure(
            (2, 3),
            PieceSet.from_piece_type(PieceType.KING),
            PieceSet.from_piece(ATT_SOLDIER),
            abort_on_edge=False,
            abort_on_corner=False,
            board=state.board,
        )
        assert encl is not None
        assert logic.enclosure_secure(encl, inside_safe, outside_safe, state.board) == is_secure


class TestExitForts:
    """game/game/logic.rs:1215-1233."""

    POSITIVES = [
        "9/9/8t/7tT/7T1/6tT1/7TK/7tT/9",  # flat
        "9/9/9/9/9/5TTTT/5T2K/6TTT/9",  # bulge
    ]
    NEGATIVES = [
        "9/9/9/8T/7Tt/7T1/7TK/8T/9",  # enemy inside
        "9/9/9/8T/7TT/7TT/7TK/8T/9",  # king can't move
        "9/9/9/8T/9/4t2T1/7TK/8T/9",  # gap
        "9/9/9/9/9/6TTT/5T2K/6TTT/9",  # vulnerable boundary
    ]

    def test_positives(self):
        logic = GameLogic(COPENHAGEN, 9)
        for s in self.POSITIVES:
            assert logic.detect_exit_fort(fen.board_from_fen(s)), s

    def test_negatives(self):
        logic = GameLogic(COPENHAGEN, 9)
        for s in self.NEGATIVES:
            assert not logic.detect_exit_fort(fen.board_from_fen(s)), s


class TestEnclosures:
    """game/game/logic.rs:1235-1385 (test_enclosures)."""

    def test_full_enclosure(self):
        board = fen.board_from_fen("2ttt2/1t1K1t1/2tttt1/7/7/7/7")
        logic = GameLogic(BRANDUBH, 7)
        encl = logic.find_enclosure(
            (1, 3),
            PieceSet.from_piece_type(PieceType.KING),
            PieceSet.from_piece_type(PieceType.SOLDIER),
            abort_on_edge=True,
            abort_on_corner=True,
            board=board,
        )
        assert encl is not None
        assert encl.occupied == {(1, 3)}
        assert encl.unoccupied == {(1, 2), (1, 4)}
        assert encl.boundary == {
            (0, 2), (0, 3), (0, 4), (1, 1), (1, 5), (2, 2), (2, 3), (2, 4),
        }

    def test_encl_with_edge(self):
        board = fen.board_from_fen("2t1t2/1t1K1t1/2tttt1/7/7/7/7")
        logic = GameLogic(BRANDUBH, 7)
        args = (
            (1, 3),
            PieceSet.from_piece_type(PieceType.KING),
            PieceSet.from_piece_type(PieceType.SOLDIER),
        )
        assert logic.find_enclosure(*args, True, True, board) is None
        encl = logic.find_enclosure(*args, False, True, board)
        assert encl is not None
        assert encl.occupied == {(1, 3)}
        assert encl.unoccupied == {(0, 3), (1, 2), (1, 4)}
        assert encl.boundary == {
            (0, 2), (0, 4), (1, 1), (1, 5), (2, 2), (2, 3), (2, 4),
        }

    def test_encl_with_corner(self):
        board = fen.board_from_fen("5t1/4tK1/4ttt/7/7/7/7")
        logic = GameLogic(BRANDUBH, 7)
        args = (
            PieceSet.from_piece_type(PieceType.KING),
            PieceSet.from_piece_type(PieceType.SOLDIER),
        )
        assert logic.find_enclosure((1, 3), *args, False, True, board) is None
        encl = logic.find_enclosure((1, 5), *args, False, False, board)
        assert encl is not None
        assert encl.occupied == {(1, 5)}
        assert encl.unoccupied == {(0, 6), (1, 6)}
        assert encl.boundary == {(0, 5), (1, 4), (2, 5), (2, 6)}

    def test_encl_with_soldier(self):
        from alphazeroforhnefatafl_tpu.core.rules import ATT_SOLDIER, DEF_SOLDIER, KING

        board = fen.board_from_fen("2ttt2/1t1KTt1/2tttt1/7/7/7/7")
        logic = GameLogic(BRANDUBH, 7)
        assert (
            logic.find_enclosure(
                (1, 3),
                PieceSet.from_piece_type(PieceType.KING),
                PieceSet.from_piece(ATT_SOLDIER),
                True,
                True,
                board,
            )
            is None
        )
        encl = logic.find_enclosure(
            (1, 3),
            PieceSet.from_piece(KING, DEF_SOLDIER),
            PieceSet.from_piece(ATT_SOLDIER),
            True,
            True,
            board,
        )
        assert encl is not None
        assert encl.occupied == {(1, 3), (1, 4)}
        assert encl.unoccupied == {(1, 2)}
        assert encl.boundary == {
            (0, 2), (0, 3), (0, 4), (1, 1), (1, 5), (2, 2), (2, 3), (2, 4),
        }

    def test_encl_edge_2(self):
        from alphazeroforhnefatafl_tpu.core.rules import ATT_SOLDIER

        board = fen.board_from_fen("1t2t2/1t1K1t1/2tttt1/7/7/7/7")
        logic = GameLogic(BRANDUBH, 7)
        encl = logic.find_enclosure(
            (1, 3),
            PieceSet.from_piece_type(PieceType.KING),
            PieceSet.from_piece(ATT_SOLDIER),
            False,
            False,
            board,
        )
        assert encl is not None


class TestCanPlay:
    """game/game/logic.rs:1387-1403."""

    def test_can_play(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen("2tt3/1tTKt2/2tt3/7/7/7/7", BRANDUBH.starting_side)
        assert logic.side_can_play(Side.ATTACKER, state)
        assert not logic.side_can_play(Side.DEFENDER, state)

        state = GameState.from_fen("2tKt2/3t3/7/7/7/7/7", BRANDUBH.starting_side)
        assert logic.side_can_play(Side.ATTACKER, state)
        assert not logic.side_can_play(Side.DEFENDER, state)


class TestRepetitions:
    """game/game/logic.rs:1405-1421 and game/game/state.rs:164-186."""

    def test_repetition_loss(self):
        game = Game(BRANDUBH, BOARDS.BRANDUBH)
        for _ in range(3):
            for mv in ["d6-f6", "d5-f5", "f6-d6", "f5-d5"]:
                assert game.do_play(Play.from_str(mv)) is None
        outcome = game.do_play(Play.from_str("d6-f6"))
        assert outcome is not None
        assert outcome.winner == Side.DEFENDER
        assert outcome.win_reason == WinReason.REPETITION

    def test_repetition_tracker(self):
        tracker = RepetitionTracker()
        for i in range(5):
            tracker.track_play(Side.ATTACKER, Play.from_str("a1-b1"), False)
            assert tracker.get_repetitions(Side.ATTACKER) == i
            tracker.track_play(Side.DEFENDER, Play.from_str("a2-b2"), False)
            assert tracker.get_repetitions(Side.DEFENDER) == i
            tracker.track_play(Side.ATTACKER, Play.from_str("b1-a1"), False)
            assert tracker.get_repetitions(Side.ATTACKER) == i
            tracker.track_play(Side.DEFENDER, Play.from_str("b2-a2"), False)
            assert tracker.get_repetitions(Side.DEFENDER) == i
        for i in range(5):
            tracker.track_play(Side.ATTACKER, Play.from_str("f1-g1"), False)
            assert tracker.get_repetitions(Side.ATTACKER) == i
            tracker.track_play(Side.DEFENDER, Play.from_str("f2-g2"), False)
            assert tracker.get_repetitions(Side.DEFENDER) == i
            tracker.track_play(Side.ATTACKER, Play.from_str("g1-f1"), False)
            assert tracker.get_repetitions(Side.ATTACKER) == i
            tracker.track_play(Side.DEFENDER, Play.from_str("g2-f2"), False)
            assert tracker.get_repetitions(Side.DEFENDER) == i

    def test_tablut_repetition_draw(self):
        rules = TABLUT
        assert rules.repetition_rule == RepetitionRule(3, False)


class TestStrongKingCapture:
    """game/game/logic.rs:1423-1462."""

    def test_pinned_against_throne(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen("1T5/7/4t2/4K1t/4t2/7/7", Side.ATTACKER)
        _, caps, outcome = logic.do_play(P((3, 6), (3, 5)), state)
        assert caps == {(3, 4)}
        assert outcome is not None and outcome.win_reason == WinReason.KING_CAPTURED

    def test_flanked(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen("1T5/4t2/7/4Kt1/4t2/7/7", Side.ATTACKER)
        _, caps, outcome = logic.do_play(P((1, 4), (2, 4)), state)
        assert caps == {(3, 4)}
        assert outcome is not None and outcome.win_reason == WinReason.KING_CAPTURED

    def test_pinned_not_flanked(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen("1T5/7/7/4K1t/4t2/7/7", Side.ATTACKER)
        _, caps, outcome = logic.do_play(P((3, 6), (3, 5)), state)
        assert caps == set()
        assert outcome is None

    def test_flanked_not_pinned(self):
        logic = GameLogic(BRANDUBH, 7)
        state = GameState.from_fen("1T5/4t2/7/4K2/4t2/7/7", Side.ATTACKER)
        _, caps, outcome = logic.do_play(P((1, 4), (2, 4)), state)
        assert caps == set()
        assert outcome is None


class TestLinnaeanCapture:
    """game/game/logic.rs:1464-1482."""

    def test_linnaean(self):
        logic = GameLogic(TABLUT, 9)
        state = GameState.from_fen("tT7/9/9/4t4/t2TKt3/4t4/9/9/9", Side.ATTACKER)
        _, caps, _ = logic.do_play(P((4, 0), (4, 2)), state)
        assert caps == {(4, 3)}


class TestIterPlays:
    """game/game/mod.rs:136-207 (test_iter_plays)."""

    def test_iter_plays(self):
        game = Game(BRANDUBH, BOARDS.BRANDUBH)
        with pytest.raises(ValueError):
            list(game.logic.iter_plays((0, 0), game.state))
        with pytest.raises(ValueError):
            list(game.logic.iter_plays((1, 0), game.state))

        def dests(tile):
            return {p.to for p in game.logic.iter_plays(tile, game.state)}

        assert dests((0, 3)) == {(0, 1), (0, 2), (0, 4), (0, 5)}
        assert dests((1, 3)) == {(1, 0), (1, 1), (1, 2), (1, 4), (1, 5), (1, 6)}
        assert dests((2, 3)) == {(2, 0), (2, 1), (2, 2), (2, 4), (2, 5), (2, 6)}
        assert dests((3, 3)) == set()  # king boxed in

        game = Game(BRANDUBH, "1T5/7/7/1t3K1/7/7/7")
        assert dests((3, 1)) == {
            (1, 1), (2, 1), (4, 1), (5, 1), (6, 1), (3, 0), (3, 2), (3, 4),
        }


class TestUndo:
    """game/game/mod.rs:209-231."""

    def test_undo(self):
        game = Game(BRANDUBH, BOARDS.BRANDUBH)

        def snapshot():
            return (
                game.state.board.copy(),
                game.state.side_to_play,
                game.state.turn,
            )

        def eq(a, b):
            return np.array_equal(a[0], b[0]) and a[1:] == b[1:]

        s0 = snapshot()
        # Histories start EMPTY (Game::new, mod.rs:86-91): an undo before any
        # play is a silent no-op, not a pop of a seeded duplicate
        # (VERDICT r4 #7).
        assert game.state_history == [] and game.play_history == []
        game.undo_last_play()
        assert eq(snapshot(), s0)
        assert game.state_history == [] and game.play_history == []
        game.do_play(P((0, 3), (0, 2)))
        s1 = snapshot()
        assert not eq(s0, s1)
        game.do_play(P((2, 3), (2, 1)))
        s2 = snapshot()
        game.do_play(P((1, 3), (1, 1)))
        s3 = snapshot()
        assert not eq(s0, s3)
        assert len(game.state_history) == 3 and len(game.play_history) == 3
        game.undo_last_play()
        assert eq(snapshot(), s2)
        game.undo_last_play()
        assert eq(snapshot(), s1)
        game.undo_last_play()
        assert eq(snapshot(), s0)
        # The reference's own test undoes one extra time: state unchanged
        # (mod.rs:229-230) — and both histories are back to empty.
        game.undo_last_play()
        assert eq(snapshot(), s0)
        assert game.state_history == [] and game.play_history == []


class TestInvalidPlayRaises:
    def test_raises(self):
        game = Game(BRANDUBH, BOARDS.BRANDUBH)
        with pytest.raises(InvalidPlayError):
            game.do_play(P((0, 3), (0, 0)))


class TestPlayRecordNotation:
    """Capture notation of PlayRecord (game/play.rs:105-133)."""

    def test_capture_notation(self):
        from alphazeroforhnefatafl_tpu.core.oracle import Game
        from alphazeroforhnefatafl_tpu.core.rules import BRANDUBH, BOARDS

        from alphazeroforhnefatafl_tpu.core.oracle import Play

        game = Game(BRANDUBH, BOARDS.BRANDUBH)
        for mv in ["d1-c1", "d3-a3", "d2-a2", "e4-e2"]:
            game.do_play(Play.from_str(mv))
        # e4-e2 custodian-captures the attacker shifted to... verify via record
        recs = [str(r) for r in game.play_history]
        assert recs[0] == "d1-c1"
        last = game.play_history[-1]
        if last.captures:
            assert "x" in recs[-1]
            for t in last.captures:
                from alphazeroforhnefatafl_tpu.core import fen as fen_mod
                assert fen_mod.tile_to_str(*t) in recs[-1]
        assert last.eq_ignore_outcome(last)


class TestSwapPieces:
    """Transcription of the swap_pieces fixture (game/board/state.rs:433-444):
    swapping the king with a soldier moves the king-tracking with it."""

    def test_swap_king_and_soldier(self):
        from alphazeroforhnefatafl_tpu.core import fen as fen_mod
        from alphazeroforhnefatafl_tpu.core.oracle import GameLogic, GameState
        from alphazeroforhnefatafl_tpu.core.rules import (
            BRANDUBH,
            CELL_ATT,
            CELL_KING,
            Side,
        )

        st = GameState(
            board=fen_mod.board_from_fen("5/1K3/5/5/3t1"),
            side_to_play=Side.ATTACKER,
        )
        logic = GameLogic(BRANDUBH, 5)
        assert st.board[1, 1] == CELL_KING and st.board[4, 3] == CELL_ATT
        assert logic.get_king(st.board) == (1, 1)
        st.swap_pieces((1, 1), (4, 3))
        assert st.board[4, 3] == CELL_KING and st.board[1, 1] == CELL_ATT
        assert logic.get_king(st.board) == (4, 3)
