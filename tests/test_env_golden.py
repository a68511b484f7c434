"""Env-level golden and dense-position differential tests.

Random from-start playouts (test_env_differential.py) rarely reach
shieldwalls, exit forts or enclosures. These tests drive the JAX env's
vectorized kernels directly on the reference's hand-crafted fixtures
(``game/game/logic.rs:1089-1233``) and on dense random boards, where those
rules fire orders of magnitude more often. The Python oracle — itself pinned
by the transcribed reference tests in test_oracle_golden.py — is the truth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core import actions as A
from alphazeroforhnefatafl_tpu.core import fen
from alphazeroforhnefatafl_tpu.core.env import ONGOING, TaflEnv
from alphazeroforhnefatafl_tpu.core.oracle import GameLogic, GameState, Play
from alphazeroforhnefatafl_tpu.core.rules import (
    CELL_ATT,
    CELL_DEF,
    CELL_KING,
    COPENHAGEN,
    EMPTY,
    PRESETS,
    PieceSet,
    PieceType,
    ShieldwallRules,
    Side,
)

from tests.test_env_differential import oracle_legal_action_mask, oracle_result


def make_env_state(env: TaflEnv, board: np.ndarray, side: Side):
    s = env.reset()
    return s.replace(
        board=jnp.asarray(board, jnp.int8), side_to_play=jnp.int32(int(side))
    )


class ParityHarness:
    """One jitted env per ruleset/size, reused across many fixture boards."""

    def __init__(self, rules, n: int):
        start = fen.board_to_fen(np.zeros((n, n), np.int8))
        self.env = TaflEnv(rules, start)
        self.logic = GameLogic(rules, n)
        self.n = n
        self._step = jax.jit(self.env.step)
        self._mask = jax.jit(self.env.legal_mask)

    def check_play(self, board: np.ndarray, side: Side, play: Play):
        """Apply one play in both engines and compare everything."""
        ostate = GameState.from_fen(fen.board_to_fen(board), side)
        new_o, ocaps, _ = self.logic.do_valid_play(play, ostate)

        estate = make_env_state(self.env, board, side)
        action = A.encode_from_tiles(self.n, play.from_tile, play.to)
        estate2, info = self._step(estate, action)

        ctx = (
            f"play {play} side={side.name} on\n{fen.board_to_display_str(board)}\n"
            f"oracle after:\n{fen.board_to_display_str(new_o.board)}\n"
            f"env after:\n{fen.board_to_display_str(np.asarray(estate2.board))}"
        )
        assert not bool(info.invalid), ctx
        ecaps = {tuple(t) for t in np.argwhere(np.asarray(info.captures))}
        assert ecaps == ocaps, f"{ctx}\ncaptures oracle={ocaps} env={ecaps}"
        assert np.array_equal(np.asarray(estate2.board), new_o.board), ctx
        ores, _ = oracle_result(new_o)
        assert int(estate2.result) == ores, (
            f"{ctx}\nresult oracle={ores} env={int(estate2.result)}"
        )

    def check_mask(self, board: np.ndarray, side: Side):
        ostate = GameState.from_fen(fen.board_to_fen(board), side)
        omask = oracle_legal_action_mask(self.logic, ostate)
        emask = np.asarray(self._mask(make_env_state(self.env, board, side)))
        diff = np.nonzero(omask != emask)[0]
        assert not diff.size, (
            f"mask mismatch side={side.name} actions={diff[:10]} on\n"
            f"{fen.board_to_display_str(board)}"
        )


# ---------------------------------------------------------------------------
# Reference shieldwall fixtures, end-to-end through env.step
# (game/game/logic.rs:1089-1169)
# ---------------------------------------------------------------------------

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

CM = Play.from_tiles((4, 6), (4, 8))
M = Play.from_tiles((3, 6), (3, 8))
N = Play.from_tiles((3, 6), (3, 7))


@pytest.mark.parametrize(
    "rules,board_fen,play",
    [
        (COPENHAGEN, CORNER_SW, CM),
        (NO_CORNER_RULES, CORNER_SW, CM),
        (NO_CORNER_RULES, REGULAR_SW, M),
        (NO_CORNER_RULES, REGULAR_SW_KING, M),
        (KING_CAPTURE_RULES, REGULAR_SW_KING, M),
        (NO_CORNER_RULES, NO_SW_GAP, M),
        (NO_CORNER_RULES, NO_SW_FRIEND, M),
        (NO_CORNER_RULES, NO_SW_SMALL, M),
    ],
    ids=[
        "corner-close",
        "no-corner-close",
        "regular",
        "king-in-wall-spared",
        "king-in-wall-captured",
        "gap",
        "friend",
        "too-small",
    ],
)
def test_shieldwall_step_parity(rules, board_fen, play):
    h = ParityHarness(rules, 9)
    h.check_play(fen.board_from_fen(board_fen), Side.ATTACKER, play)


# ---------------------------------------------------------------------------
# Reference exit-fort fixtures against the env's flood-fill kernel
# (game/game/logic.rs:1215-1233)
# ---------------------------------------------------------------------------

FORT_POSITIVES = [
    "9/9/8t/7tT/7T1/6tT1/7TK/7tT/9",  # flat
    "9/9/9/9/9/5TTTT/5T2K/6TTT/9",  # bulge
]
FORT_NEGATIVES = [
    "9/9/9/8T/7Tt/7T1/7TK/8T/9",  # enemy inside
    "9/9/9/8T/7TT/7TT/7TK/8T/9",  # king can't move
    "9/9/9/8T/9/4t2T1/7TK/8T/9",  # gap
    "9/9/9/9/9/6TTT/5T2K/6TTT/9",  # vulnerable boundary
]


def test_exit_fort_kernel_parity():
    logic = GameLogic(COPENHAGEN, 9)
    env = TaflEnv(COPENHAGEN, FORT_POSITIVES[0])

    def fort(board):
        hostile = env._hostile_boards(board)
        kflat = jnp.argmax((board == CELL_KING).reshape(-1))
        return env._exit_fort(
            board, hostile, kflat // 9, kflat % 9, live=jnp.asarray(True)
        )

    fort_fn = jax.jit(fort)
    for s in FORT_POSITIVES + FORT_NEGATIVES:
        board = fen.board_from_fen(s)
        got = bool(fort_fn(jnp.asarray(board, jnp.int8)))
        assert got == logic.detect_exit_fort(board), s


# ---------------------------------------------------------------------------
# Dense random boards: captures/shieldwalls/forts fire constantly
# ---------------------------------------------------------------------------


def random_dense_board(rng: np.random.RandomState, n: int) -> np.ndarray:
    """A random position with one king and ~28% piece density; corners and
    throne stay empty except the king may hold the throne."""
    board = np.zeros((n, n), np.int8)
    density = rng.uniform(0.15, 0.4)
    cells = rng.rand(n, n) < density
    sides = rng.rand(n, n) < 0.5
    board[cells & sides] = CELL_ATT
    board[cells & ~sides] = CELL_DEF
    for r, c in [(0, 0), (0, n - 1), (n - 1, 0), (n - 1, n - 1)]:
        board[r, c] = EMPTY
    board[n // 2, n // 2] = EMPTY
    # Place the king somewhere empty (possibly the throne).
    empties = np.argwhere(board == EMPTY)
    kr, kc = empties[rng.randint(len(empties))]
    board[kr, kc] = CELL_KING
    return board


@pytest.mark.parametrize("preset", ["copenhagen", "tablut", "brandubh"])
def test_dense_board_parity(preset):
    rules, start = PRESETS[preset]
    n = fen.board_from_fen(start).shape[0]
    h = ParityHarness(rules, n)
    rng = np.random.RandomState(hash(preset) % (2**31))

    boards = 8
    plays_per_side = 4
    for _ in range(boards):
        board = random_dense_board(rng, n)
        for side in (Side.ATTACKER, Side.DEFENDER):
            h.check_mask(board, side)
            ostate = GameState.from_fen(fen.board_to_fen(board), side)
            plays = h.logic.all_plays(ostate)
            if not plays:
                continue
            picks = rng.choice(len(plays), min(plays_per_side, len(plays)), replace=False)
            for i in picks:
                h.check_play(board, side, plays[int(i)])


# ---------------------------------------------------------------------------
# Large/Huge board sizes (the reference's Large/HugeBasicGame storage classes
# support 15x15 and 21x21 boards, game/game/mod.rs:119-125 /
# game/board/state.rs:332-340; our planes engine is size-generic)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [15, 21])
def test_large_board_differential(n):
    rules = PRESETS["copenhagen"][0]
    rng = np.random.RandomState(n)
    # A sparse random position with the king near the center.
    board = np.zeros((n, n), np.int8)
    cells = rng.rand(n, n) < 0.12
    sides = rng.rand(n, n) < 0.5
    board[cells & sides] = CELL_ATT
    board[cells & ~sides] = CELL_DEF
    for r, c in [(0, 0), (0, n - 1), (n - 1, 0), (n - 1, n - 1), (n // 2, n // 2)]:
        board[r, c] = EMPTY
    board[n // 2, n // 2 - 1] = CELL_KING

    h = ParityHarness(rules, n)
    for side in (Side.ATTACKER, Side.DEFENDER):
        h.check_mask(board, side)
        ostate = GameState.from_fen(fen.board_to_fen(board), side)
        plays = h.logic.all_plays(ostate)
        picks = rng.choice(len(plays), min(4, len(plays)), replace=False)
        for i in picks:
            h.check_play(board, side, plays[int(i)])


# ---------------------------------------------------------------------------
# Play-validity scenarios at every reference board width
# (generic_test_play_validity instantiated for Small/Medium/Large/Huge,
# game/game/logic.rs:1015-1021: there the same fixture exercises four STORAGE
# widths u64/u128/U256/U512; the planes engine is size-generic, so the
# equivalent is the same validity scenarios at the four reference board
# sizes, checked in both the oracle (ordered error codes) and the JAX env
# (legal mask)).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [7, 11, 15, 21])
def test_play_validity_all_reference_widths(n):
    from alphazeroforhnefatafl_tpu.core.rules import PlayInvalid

    rules = PRESETS["brandubh"][0]
    board = np.zeros((n, n), np.int8)
    board[0, 3] = CELL_ATT       # mover under test
    board[0, 5] = CELL_DEF       # destination blocker
    board[2, 3] = CELL_DEF       # mid-path blocker for (0,3)->(3,3)
    board[2, 2] = CELL_DEF       # wrong-player piece
    board[n - 2, n - 2] = CELL_KING

    logic = GameLogic(rules, n)
    ostate = GameState.from_fen(fen.board_to_fen(board), Side.ATTACKER)

    cases = [
        (Play.from_tiles((0, 3), (1, 3)), None),
        (Play.from_tiles((0, 3), (0, 0)), PlayInvalid.MOVE_ONTO_BLOCKED_TILE),
        (Play.from_tiles((1, 1), (2, 1)), PlayInvalid.NO_PIECE),
        (Play.from_tiles((0, 3), (0, n)), PlayInvalid.OUT_OF_BOUNDS),
        (Play.from_tiles((0, 3), (0, 6)), PlayInvalid.BLOCKED_BY_PIECE),
        (Play.from_tiles((0, 3), (3, 3)), PlayInvalid.BLOCKED_BY_PIECE),
        (Play.from_tiles((2, 2), (3, 2)), PlayInvalid.WRONG_PLAYER),
    ]
    for play, expected in cases:
        assert logic.validate_play(play, ostate) == expected, (n, str(play))

    # The JAX env's legal mask must agree wherever a mask can express it
    # (everything except WRONG_PLAYER/OUT_OF_BOUNDS, which have no action id
    # for the moving side / at all).
    env = TaflEnv(rules, fen.board_to_fen(board))
    estate = make_env_state(env, board, Side.ATTACKER)
    mask = np.asarray(jax.jit(env.legal_mask)(estate))
    for play, expected in cases:
        if expected in (PlayInvalid.WRONG_PLAYER, PlayInvalid.OUT_OF_BOUNDS):
            continue
        aid = A.encode_from_tiles(n, play.from_tile, play.to)
        assert bool(mask[aid]) == (expected is None), (n, str(play))
