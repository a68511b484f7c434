"""Device-side episode accumulation (``SelfPlayConfig.scan_moves``).

The scan path advances many moves per dispatch entirely on device and the
host stitches episodes out of the emitted position stream. Truth anchor: it
must produce bit-identical games to the per-move host loop for the same seed
(the RNG discipline is one ``split`` per move in both paths), and must be
seed-deterministic on its own.
"""

import numpy as np
import jax

from alphazeroforhnefatafl_tpu.core.env import make_env
from alphazeroforhnefatafl_tpu.search.mcts import MCTSConfig
from alphazeroforhnefatafl_tpu.train.selfplay import SelfPlayActor, SelfPlayConfig
from tests.test_mcts import make_fake_evaluate


class _Recorder:
    """Replay stand-in that keeps each episode's ``add`` payload."""

    def __init__(self):
        self.episodes = []

    def add(self, board, side, reps, pidx, pp, z):
        self.episodes.append(
            tuple(np.asarray(a).copy() for a in (board, side, reps, pidx, pp, z))
        )


def _run(scan_moves, *, batch_size=1, seed=7, num_games=3, resign=None):
    env = make_env("brandubh")
    cfg = SelfPlayConfig(
        batch_size=batch_size,
        temp_threshold=4,
        max_game_len=20,
        policy_k=8,
        scan_moves=scan_moves,
        resign_threshold=resign,
    )
    actor = SelfPlayActor(
        env,
        make_fake_evaluate(env),
        MCTSConfig(num_simulations=8, max_children=16, max_depth=16),
        cfg,
    )
    rec = _Recorder()
    stats = actor.play(None, rec, jax.random.PRNGKey(seed), num_games=num_games)
    return rec.episodes, stats


def test_scan_path_matches_host_loop_bitwise():
    # batch_size=1 so both paths emit the one slot's episode stream in
    # order; scan_moves=6 < game length forces episodes to span chunk
    # boundaries (exercising the pending-segment stitching).
    host_eps, _ = _run(0)
    scan_eps, _ = _run(6)
    n = min(len(host_eps), len(scan_eps))
    assert n >= 3
    for i in range(n):
        for h, s, name in zip(
            host_eps[i],
            scan_eps[i],
            ("board", "side", "reps", "pidx", "pp", "z"),
        ):
            assert np.array_equal(h, s), f"episode {i} field {name} differs"


def test_scan_path_seed_deterministic_multislot():
    e1, s1 = _run(5, batch_size=4, num_games=6)
    e2, s2 = _run(5, batch_size=4, num_games=6)
    assert s1.as_dict() == s2.as_dict()
    assert len(e1) == len(e2) >= 6
    for a, b in zip(e1, e2):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
    e3, _ = _run(5, batch_size=4, num_games=6, seed=8)
    assert not all(
        len(a[1]) == len(b[1]) and np.array_equal(a[0], b[0])
        for a, b in zip(e1, e3)
    )


def test_scan_path_with_resignation_runs_and_counts():
    eps, stats = _run(
        6, batch_size=4, num_games=6, resign=0.2, seed=3
    )
    d = stats.as_dict()
    assert stats.games >= 6
    assert stats.positions == stats.length_sum == sum(len(e[1]) for e in eps)
    assert (
        stats.attacker_wins + stats.defender_wins + stats.draws == stats.games
    )
    assert stats.truncated <= stats.draws
    assert 0.0 <= d["resign_fp_rate"] <= 1.0
