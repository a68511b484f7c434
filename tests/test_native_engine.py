"""Differential tests: native C++ engine vs the Python oracle.

Many more random playouts than the JAX differential suite (the native engine
is fast), across all presets: boards, legal masks, captures, repetition
counters and outcomes must agree move for move.
"""

import shutil

import numpy as np
import pytest

from alphazeroforhnefatafl_tpu.core import actions as A
from alphazeroforhnefatafl_tpu.core import fen
from alphazeroforhnefatafl_tpu.core.oracle import GameLogic, GameState
from alphazeroforhnefatafl_tpu.core.rules import PRESETS, Side

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)


def oracle_mask(logic, state):
    mask = np.zeros(A.num_actions(logic.n), dtype=bool)
    if state.ongoing:
        for play in logic.all_plays(state):
            mask[A.encode_from_tiles(logic.n, play.from_tile, play.to)] = True
    return mask


def oracle_result_code(state):
    from alphazeroforhnefatafl_tpu.core.env import DRAW, ONGOING

    if state.outcome is None:
        return ONGOING
    if state.outcome.winner is None:
        return DRAW
    return int(state.outcome.winner)


def play_differential(preset: str, seed: int, max_steps: int = 400):
    from alphazeroforhnefatafl_tpu.core.oracle import Play
    from alphazeroforhnefatafl_tpu.native import NativeGame

    rules, board_fen = PRESETS[preset]
    n = len(board_fen.split("/"))
    logic = GameLogic(rules, n)
    ostate = GameState.from_fen(board_fen, rules.starting_side)
    ng = NativeGame(rules, board_fen)

    rng = np.random.RandomState(seed)
    for step_i in range(max_steps):
        omask = oracle_mask(logic, ostate)
        nmask = ng.legal_mask()
        if not np.array_equal(omask, nmask):
            diff = np.nonzero(omask != nmask)[0]
            msgs = [
                f"action {a} {fen.play_to_str(*A.decode_to_tiles(n, int(a)))}: "
                f"oracle={omask[a]} native={nmask[a]}"
                for a in diff[:10]
            ]
            raise AssertionError(
                f"[{preset} seed={seed} step={step_i}] legal mask mismatch\n"
                f"{fen.board_to_display_str(ostate.board)}"
                f"side={ostate.side_to_play.name}\n" + "\n".join(msgs)
            )
        if not omask.any():
            assert not ostate.ongoing
            break
        action = int(rng.choice(np.nonzero(omask)[0]))
        src, dst = A.decode_to_tiles(n, action)
        ostate, ocaps, _ = logic.do_valid_play(Play.from_tiles(src, dst), ostate)
        ng.step(action)
        ctx = f"[{preset} seed={seed} step={step_i}] after {fen.play_to_str(src, dst)}"
        assert set(ng.last_captures()) == ocaps, ctx
        assert np.array_equal(ng.board(), ostate.board), (
            f"{ctx}\noracle:\n{fen.board_to_display_str(ostate.board)}"
            f"native:\n{fen.board_to_display_str(ng.board())}"
        )
        assert ng.reps(0) == ostate.repetitions.attacker_reps, ctx
        assert ng.reps(1) == ostate.repetitions.defender_reps, ctx
        assert ng.result == oracle_result_code(ostate), (
            f"{ctx}: native result {ng.result} ({ng.reason}) vs oracle "
            f"{oracle_result_code(ostate)} ({ostate.outcome})"
        )
        if not ostate.ongoing:
            break


@pytest.mark.parametrize("preset", sorted(PRESETS.keys()))
def test_native_differential(preset):
    for seed in range(4):
        play_differential(preset, seed)


def test_native_rejects_invalid():
    from alphazeroforhnefatafl_tpu.native import NativeGame

    rules, board_fen = PRESETS["brandubh"]
    ng = NativeGame(rules, board_fen)
    with pytest.raises(ValueError):
        ng.step(0)  # (0,0) is an empty corner: no piece
    with pytest.raises(ValueError):
        NativeGame(rules, "3t3/3t2/7")  # ragged FEN
