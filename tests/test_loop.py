"""End-to-end smoke tests for the AlphaZero loop: iterate, checkpoint,
resume (SURVEY.md §5 checkpoint/resume — absent from the reference, which
has no training loop at all)."""

import json
import os

import numpy as np

from alphazeroforhnefatafl_tpu.core.env import make_env
from alphazeroforhnefatafl_tpu.search.mcts import MCTSConfig
from alphazeroforhnefatafl_tpu.train.loop import LoopConfig, run_loop
from alphazeroforhnefatafl_tpu.train.selfplay import SelfPlayConfig
from alphazeroforhnefatafl_tpu.utils.metrics import MetricsLogger


def tiny_config(tmp_path, iterations):
    return LoopConfig(
        preset="brandubh",
        iterations=iterations,
        games_per_iteration=6,
        train_steps_per_iteration=4,
        train_batch_size=32,
        min_replay_size=16,
        replay_capacity=5_000,
        channels=8,
        blocks=1,
        arena_games=0,
        seed=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mcts=MCTSConfig(num_simulations=8, max_children=16, max_depth=16),
        selfplay=SelfPlayConfig(batch_size=6, temp_threshold=4, max_game_len=60, policy_k=16),
    )


def test_loop_runs_checkpoints_and_resumes(tmp_path):
    env = make_env("brandubh")
    metrics_path = tmp_path / "m.jsonl"

    cfg = tiny_config(tmp_path, iterations=2)
    log = MetricsLogger(jsonl_path=str(metrics_path))
    state = run_loop(env, cfg, log=log)
    assert int(state.step) > 0

    lines = [json.loads(l) for l in open(metrics_path)]
    assert len(lines) == 2
    assert lines[0]["selfplay/games"] >= 6
    assert "train/loss" in lines[-1]

    # Checkpoints were written.
    files = os.listdir(cfg.checkpoint_dir)
    assert files, "no checkpoint files written"

    # Resume: extending iterations continues from the saved iteration
    # instead of restarting (iteration 2 only -> exactly one new metrics row).
    cfg3 = tiny_config(tmp_path, iterations=3)
    log2 = MetricsLogger(jsonl_path=str(tmp_path / "m2.jsonl"))
    state2 = run_loop(env, cfg3, log=log2)
    lines2 = [json.loads(l) for l in open(tmp_path / "m2.jsonl")]
    resumed = [l for l in lines2 if "selfplay/games" in l]
    assert len(resumed) == 1, f"expected 1 resumed iteration, got {len(resumed)}"
    assert int(state2.step) > int(state.step)


def test_loop_resume_across_gating_toggle(tmp_path):
    """An ungated checkpoint resumes cleanly into a gated config (template
    built from the checkpoint's actual saved keys, no blanket except) and
    the gap is surfaced as a metric."""
    import dataclasses

    env = make_env("brandubh")
    cfg = tiny_config(tmp_path, iterations=1)
    run_loop(env, cfg)  # ungated: extra payload saved empty

    from alphazeroforhnefatafl_tpu.train.checkpoint import CheckpointManager

    assert CheckpointManager(cfg.checkpoint_dir).saved_extra_keys() == ()

    gated = dataclasses.replace(
        tiny_config(tmp_path, iterations=2),
        arena_games=6,
        arena_sims=4,
        arena_every=1,
        arena_max_game_len=12,
        gate_on="decisive",
        gate_min_decisive=1,
        gate_threshold=0.6,
    )
    log = MetricsLogger(jsonl_path=str(tmp_path / "mg.jsonl"))
    run_loop(env, gated, log=log)
    lines = [json.loads(l) for l in open(tmp_path / "mg.jsonl")]
    assert any(l.get("resume/incumbent_missing") == 1.0 for l in lines)
    row = [l for l in lines if "arena/games" in l][-1]
    # Truncations reported separately; decisive gating emitted a verdict.
    assert "arena/truncated" in row and "arena/decisive_score" in row
    assert row["arena/promoted"] in (0.0, 1.0)
    # And the now-gated checkpoint carries the incumbent payload.
    assert CheckpointManager(cfg.checkpoint_dir).saved_extra_keys() == (
        "incumbent_params",
    )


def test_arena_every_zero_disables_arena(tmp_path):
    """``arena_every=0`` means "never run the arena" — and therefore ungated
    self-play. Regression: it used to hit ``% 0`` (ZeroDivisionError) the
    first iteration the replay crossed ``min_replay_size``."""
    import dataclasses

    env = make_env("brandubh")
    cfg = dataclasses.replace(
        tiny_config(tmp_path, iterations=2),
        arena_games=6,
        arena_every=0,
        min_replay_size=16,
        checkpoint_dir=None,
    )
    log = MetricsLogger(jsonl_path=str(tmp_path / "ma.jsonl"))
    state = run_loop(env, cfg, log=log)
    assert int(state.step) > 0
    lines = [json.loads(l) for l in open(tmp_path / "ma.jsonl")]
    assert not any("arena/games" in l for l in lines)


def test_params_only_restore(tmp_path):
    """Params-only restore (replay=None) — the Elo-ladder path in
    eval_run.py/cross_ladder.py/cli ladder. Regression: the manager's
    registered StandardCheckpointHandler rejects PyTreeRestore args, so the
    params-only branch must read the step's item directory directly; before
    the fix every ladder restore raised (and eval_run silently skipped all
    steps)."""
    import jax

    from alphazeroforhnefatafl_tpu.models.network import make_network
    from alphazeroforhnefatafl_tpu.train.checkpoint import CheckpointManager
    from alphazeroforhnefatafl_tpu.train.learner import (
        init_train_state,
        make_optimizer,
    )

    env = make_env("brandubh")
    cfg = tiny_config(tmp_path, iterations=1)
    state = run_loop(env, cfg)  # writes a checkpoint with a replay payload

    net = make_network(env.n, channels=cfg.channels, blocks=cfg.blocks)
    base = init_train_state(
        net, jax.random.PRNGKey(0), env.num_observation_planes, make_optimizer()
    )
    mgr = CheckpointManager(cfg.checkpoint_dir)
    step, restored, rng, extra = mgr.restore(base, None)
    assert step == mgr.latest_iteration()
    got = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(restored.params)]
    )
    want = np.concatenate(
        [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(state.params)]
    )
    np.testing.assert_array_equal(got, want)
    assert extra == {}


def test_params_only_restore_from_gated_checkpoint(tmp_path):
    """Elo-ladder (params-only) restore of a GATED checkpoint: the on-disk
    ``extra`` carries the incumbent params dict; the restore template must
    omit the key entirely (regression: an empty-dict template node made
    orbax's partial-restore trim raise 'Type mismatch at (extra,)' — found
    by the round-3 gumbel wall-clock cross-ladder)."""
    import dataclasses

    import jax

    from alphazeroforhnefatafl_tpu.models.network import make_network
    from alphazeroforhnefatafl_tpu.train.checkpoint import CheckpointManager
    from alphazeroforhnefatafl_tpu.train.learner import (
        init_train_state,
        make_optimizer,
    )

    env = make_env("brandubh")
    cfg = dataclasses.replace(
        tiny_config(tmp_path, iterations=1),
        arena_games=6,
        arena_sims=4,
        arena_max_game_len=12,
    )
    run_loop(env, cfg)  # gated -> extra={"incumbent_params": ...} on disk

    mgr = CheckpointManager(cfg.checkpoint_dir)
    assert mgr.saved_extra_keys() == ("incumbent_params",)
    net = make_network(env.n, channels=cfg.channels, blocks=cfg.blocks)
    base = init_train_state(
        net, jax.random.PRNGKey(0), env.num_observation_planes, make_optimizer()
    )
    step, ts, rng, extra = mgr.restore(base, None)  # must not raise
    assert extra == {}
    assert int(np.asarray(ts.step)) >= 0


def test_params_only_restore_arch_mismatch(tmp_path):
    """Restoring a checkpoint into a template of a DIFFERENT architecture
    must raise a clear error, not silently return on-disk shapes (orbax
    partial_restore ignores template shapes)."""
    import dataclasses

    import jax
    import pytest

    from alphazeroforhnefatafl_tpu.models.network import make_network
    from alphazeroforhnefatafl_tpu.train.checkpoint import CheckpointManager
    from alphazeroforhnefatafl_tpu.train.learner import (
        init_train_state,
        make_optimizer,
    )

    env = make_env("brandubh")
    cfg = tiny_config(tmp_path, iterations=1)
    run_loop(env, cfg)  # channels=8 checkpoint

    wrong = make_network(env.n, channels=16, blocks=cfg.blocks)
    base = init_train_state(
        wrong, jax.random.PRNGKey(0), env.num_observation_planes, make_optimizer()
    )
    mgr = CheckpointManager(cfg.checkpoint_dir)
    with pytest.raises(ValueError, match="different architecture"):
        mgr.restore(base, None)

    # STRUCTURAL mismatches (same-shape leaves, different tree): a deeper
    # trunk and a norm-free trunk. Before the metadata check these silently
    # passed partial_restore through as fresh-init leaves (same shapes),
    # laddering a frankennet / a 100% fresh init.
    for net2 in (
        make_network(env.n, channels=cfg.channels, blocks=cfg.blocks + 1),
        make_network(env.n, channels=cfg.channels, blocks=cfg.blocks, norm="none"),
    ):
        base2 = init_train_state(
            net2, jax.random.PRNGKey(0), env.num_observation_planes, make_optimizer()
        )
        with pytest.raises(ValueError, match="different architecture"):
            mgr.restore(base2, None)


def test_wilson_gate_bound():
    """decisive_wilson_lb (VERDICT r4 #5): confidence-aware gate signal."""
    from alphazeroforhnefatafl_tpu.train.arena import ArenaResult

    # 9/12 decisive (the round-4 failure mode: decisive games are few).
    r = ArenaResult(games=64, candidate_wins=9, incumbent_wins=3, draws=52)
    assert r.decisive_games == 12
    lb1, lb2 = r.decisive_wilson_lb(1.0), r.decisive_wilson_lb(1.96)
    # The bound sits strictly below the point estimate and tightens with z.
    assert 0.5 < lb1 < r.decisive_score
    assert lb2 < lb1 < r.decisive_score
    # At 95% confidence 9/12 is NOT enough to clear 0.5 — the gate holds.
    assert lb2 < 0.5
    # More decisive evidence at the same rate clears the stricter bound too.
    big = ArenaResult(games=64, candidate_wins=36, incumbent_wins=12, draws=16)
    assert big.decisive_wilson_lb(1.96) > 0.5
    # No decisive games -> bound 0: never promotes.
    r0 = ArenaResult(games=4, candidate_wins=0, incumbent_wins=0, draws=4)
    assert r0.decisive_wilson_lb() == 0.0
    d = r.as_dict()
    assert "decisive_wilson_lb" in d and "prior_fallback_rate" in d


def test_play_config_match_two_search_configs():
    """play_config_match pits two MCTSConfigs with one net: completes, counts
    are consistent, and the per-half config split preserves the color
    alternation accounting."""
    import jax

    from alphazeroforhnefatafl_tpu.train.arena import play_config_match
    from alphazeroforhnefatafl_tpu.models.network import (
        init_params,
        make_network,
    )

    env = make_env("brandubh")
    net = make_network(env.n, channels=8, blocks=1)
    params = init_params(net, jax.random.PRNGKey(0), env.num_observation_planes)
    res = play_config_match(
        env,
        jax.jit(lambda p, obs: net.apply(p, obs)),
        params,
        params,
        MCTSConfig(num_simulations=8, max_children=8, max_depth=8,
                   dirichlet_eps=0.0, leaves_per_wave=2),
        MCTSConfig(num_simulations=8, max_children=8, max_depth=8,
                   dirichlet_eps=0.0),
        num_games=4,
        max_game_len=40,
        rng=jax.random.PRNGKey(1),
    )
    assert res.games == 4
    assert (
        res.candidate_wins + res.incumbent_wins + res.draws + res.truncated == 4
    )
    assert 0.0 <= res.prior_fallback_rate <= 1.0
