"""Arena evaluation: pit two policies against each other.

The evaluation half the reference's AlphaZero layer implies but never built
(alpha-zero-general pits new vs old nets to gate model promotion). Plays a
lockstep batch of games with MCTS on both sides — candidate vs incumbent —
alternating colors, and reports win rates and an Elo delta estimate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..core.env import DRAW, TaflEnv
from ..search.mcts import MCTS, MCTSConfig, select_actions


@dataclass
class ArenaResult:
    games: int
    candidate_wins: int
    incumbent_wins: int
    draws: int

    @property
    def score(self) -> float:
        """Candidate score in [0, 1] (draws count half)."""
        if self.games == 0:
            return 0.5
        return (self.candidate_wins + 0.5 * self.draws) / self.games

    @property
    def elo_delta(self) -> float:
        s = min(max(self.score, 1e-3), 1 - 1e-3)
        return -400.0 * math.log10(1.0 / s - 1.0)

    def as_dict(self):
        return {
            "games": self.games,
            "candidate_wins": self.candidate_wins,
            "incumbent_wins": self.incumbent_wins,
            "draws": self.draws,
            "score": self.score,
            "elo_delta": self.elo_delta,
        }


def ladder(
    env: TaflEnv,
    evaluate: Callable,
    named_params,  # list of (name, params)
    mcts_config: MCTSConfig,
    games_per_pair: int = 16,
    rng: jax.Array = None,
    iters: int = 200,
):
    """Round-robin all checkpoints and fit Elo ratings.

    Plays every ordered pair once (``games_per_pair`` games, colors
    alternating inside play_match), then fits ratings by iterative
    logistic (Elo) minorization with the first entry anchored at 0.
    Returns (ratings dict, score matrix).
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    n = len(named_params)
    wins = np.zeros((n, n))  # expected score sums of i vs j
    games = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            rng, sub = jax.random.split(rng)
            res = play_match(
                env,
                evaluate,
                named_params[i][1],
                named_params[j][1],
                mcts_config,
                num_games=games_per_pair,
                rng=sub,
            )
            wins[i, j] = res.score * res.games
            wins[j, i] = (1 - res.score) * res.games
            games[i, j] = games[j, i] = res.games

    # Elo fit: r_i maximizing the Bradley-Terry likelihood (MM updates).
    r = np.zeros(n)
    for _ in range(iters):
        expect = 1.0 / (1.0 + 10 ** ((r[None, :] - r[:, None]) / 400.0))
        grad = (wins - games * expect).sum(axis=1)
        r = r + 4.0 * grad / np.maximum(games.sum(axis=1), 1)
        r -= r[0]  # anchor
    ratings = {name: float(r[i]) for i, (name, _) in enumerate(named_params)}
    return ratings, wins, games


def play_match(
    env: TaflEnv,
    evaluate: Callable,
    params_candidate,
    params_incumbent,
    mcts_config: MCTSConfig,
    num_games: int = 32,
    max_game_len: int = 256,
    rng: jax.Array = None,
) -> ArenaResult:
    """Play ``num_games`` (half with candidate as attacker, half as defender)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    B = num_games
    mcts = MCTS(env, evaluate, mcts_config)

    def move(params, states, rng):
        legal = jax.vmap(env.legal_mask)(states)
        result = mcts.search(params, states, legal, rng, add_noise=False)
        actions = select_actions(
            result.action_probs, legal, jnp.zeros((B,)), rng
        )
        new_states, _ = env.step_many(states, actions)
        return new_states

    move = jax.jit(move)

    # candidate plays attacker in games [0, B/2), defender in [B/2, B).
    cand_is_attacker = np.arange(B) < B // 2
    states = env.reset_batch(B)
    done_results = np.full(B, -2, np.int32)  # -2 = still running

    starting_side = int(env.rules.starting_side)
    for move_i in range(max_game_len):
        # Every running game is at the same ply (terminated games freeze), so
        # the side to move is a pure function of the move index.
        side = (starting_side + move_i) % 2
        use_candidate = cand_is_attacker if side == 0 else ~cand_is_attacker
        rng, sub_c, sub_i = jax.random.split(rng, 3)
        # Both policies compute their move for the full batch; each game keeps
        # the one belonging to the player on turn. (Two searches per ply; a
        # later optimization can stack params and vmap a single search.)
        states_c = move(params_candidate, states, sub_c)
        states_i = move(params_incumbent, states, sub_i)
        sel = jnp.asarray(use_candidate)

        def pick(c, i):
            d = sel.reshape(sel.shape + (1,) * (c.ndim - 1))
            return jnp.where(d, c, i)

        states = jax.tree_util.tree_map(pick, states_c, states_i)

        res = np.asarray(states.result)
        term = np.asarray(states.terminated)
        newly = term & (done_results == -2)
        done_results[newly] = res[newly]
        if term.all():
            break

    cand_w = incumbent_w = draws = 0
    for g in range(B):
        r = int(done_results[g])
        if r in (-2, DRAW):
            draws += 1
        elif (r == 0) == bool(cand_is_attacker[g]):
            cand_w += 1
        else:
            incumbent_w += 1
    return ArenaResult(
        games=B, candidate_wins=cand_w, incumbent_wins=incumbent_w, draws=draws
    )
