"""Differential tests: the JAX env must agree with the Python oracle
move-for-move on random playouts under a fixed seed.

This is the parity methodology of BASELINE.md config 1 (Brandubh 7x7
random-rollout step parity vs the reference engine), applied to every preset:
at each step, legal masks, captures, resulting boards, repetition counters
and outcomes must match exactly.
"""

import numpy as np
import pytest
import jax

from alphazeroforhnefatafl_tpu.core import actions as A
from alphazeroforhnefatafl_tpu.core import fen
from alphazeroforhnefatafl_tpu.core.env import (
    DRAW,
    ONGOING,
    WIN_ATTACKER,
    WIN_DEFENDER,
    R_DRAW_NO_PLAYS,
    R_DRAW_REPETITION,
    TaflEnv,
)
from alphazeroforhnefatafl_tpu.core.oracle import GameLogic, GameState, Play
from alphazeroforhnefatafl_tpu.core.rules import PRESETS, Side


def oracle_legal_action_mask(logic: GameLogic, state: GameState) -> np.ndarray:
    n = logic.n
    mask = np.zeros(A.num_actions(n), dtype=bool)
    if state.ongoing:
        for play in logic.all_plays(state):
            mask[A.encode_from_tiles(n, play.from_tile, play.to)] = True
    return mask


def oracle_result(state: GameState):
    if state.outcome is None:
        return ONGOING, None
    o = state.outcome
    if o.winner is None:
        return DRAW, o.draw_reason
    return (WIN_ATTACKER if o.winner == Side.ATTACKER else WIN_DEFENDER), o.win_reason


def play_differential_game(preset: str, seed: int, max_steps: int = 300):
    rules, board_fen = PRESETS[preset]
    env = TaflEnv(rules, board_fen)
    n = env.n
    logic = GameLogic(rules, n)
    ostate = GameState.from_fen(board_fen, rules.starting_side)

    step_fn = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)

    estate = env.reset()
    rng = np.random.RandomState(seed)

    for step_i in range(max_steps):
        omask = oracle_legal_action_mask(logic, ostate)
        emask = np.asarray(mask_fn(estate))
        if not np.array_equal(omask, emask):
            diff = np.nonzero(omask != emask)[0]
            msgs = []
            for a in diff[:10]:
                src, dst = A.decode_to_tiles(n, int(a))
                msgs.append(
                    f"action {a} {fen.play_to_str(src, dst)}: oracle={omask[a]} env={emask[a]}"
                )
            raise AssertionError(
                f"[{preset} seed={seed} step={step_i}] legal mask mismatch "
                f"({len(diff)} actions)\nboard:\n"
                f"{fen.board_to_display_str(ostate.board)}\n"
                f"side={ostate.side_to_play.name}\n" + "\n".join(msgs)
            )
        if not omask.any():
            assert not ostate.ongoing
            break

        action = int(rng.choice(np.nonzero(omask)[0]))
        src, dst = A.decode_to_tiles(n, action)
        play = Play.from_tiles(src, dst)

        ostate, ocaps, _ = logic.do_valid_play(play, ostate)
        estate, info = step_fn(estate, action)

        ctx = (
            f"[{preset} seed={seed} step={step_i}] after {fen.play_to_str(src, dst)}\n"
            f"oracle board:\n{fen.board_to_display_str(ostate.board)}\n"
            f"env board:\n{fen.board_to_display_str(np.asarray(estate.board))}"
        )
        assert not bool(info.invalid), ctx
        ecaps = {tuple(t) for t in np.argwhere(np.asarray(info.captures))}
        assert ecaps == ocaps, f"{ctx}\ncaptures oracle={ocaps} env={ecaps}"
        assert np.array_equal(np.asarray(estate.board), ostate.board), ctx
        # Repetition counters.
        assert int(estate.reps[0]) == ostate.repetitions.attacker_reps, ctx
        assert int(estate.reps[1]) == ostate.repetitions.defender_reps, ctx
        # Outcome.
        ores, oreason = oracle_result(ostate)
        assert int(estate.result) == ores, f"{ctx}\nresult oracle={ores} env={int(estate.result)} reason={oreason}"
        if ores != ONGOING:
            if ores == DRAW:
                expect = {0: R_DRAW_REPETITION, 1: R_DRAW_NO_PLAYS}[int(oreason)]
            else:
                expect = int(oreason)
            assert int(estate.reason) == expect, ctx
            break

    return int(estate.turn)


@pytest.mark.parametrize("preset", sorted(PRESETS.keys()))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_random_playouts(preset, seed):
    play_differential_game(preset, seed)


def test_differential_many_brandubh():
    """Config-1-style: many fixed-seed Brandubh games, move-for-move parity."""
    for seed in range(3, 15):
        play_differential_game("brandubh", seed)
