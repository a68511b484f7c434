"""The AlphaZero training loop.

Ties together the components the reference only implied: self-play actors
(``src/mcts.py`` consumers), a replay buffer (successor of
``game/main.rs:86-132``), the learner, arena gating, checkpointing and
metrics. Single-host here; multi-host orchestration layers on top via
``jax.distributed`` (see ``parallel``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.env import TaflEnv
from ..models.network import make_network
from ..search.mcts import MCTSConfig
from ..utils.metrics import MetricsLogger
from .arena import play_match
from .checkpoint import CheckpointManager
from .learner import init_train_state, make_optimizer, make_train_step
from .replay import ReplayBuffer, make_batch_builder
from .selfplay import SelfPlayActor, SelfPlayConfig


@dataclass(frozen=True)
class LoopConfig:
    preset: str = "brandubh"
    iterations: int = 10
    games_per_iteration: int = 64
    train_steps_per_iteration: int = 100
    train_batch_size: int = 256
    min_replay_size: int = 512
    replay_capacity: int = 200_000
    learning_rate: float = 2e-3
    channels: int = 64
    blocks: int = 6
    arena_games: int = 0  # 0 disables arena gating
    arena_sims: int = 64
    gate_threshold: float = 0.55
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 1
    seed: int = 0
    #: Apply a random D4 board/action symmetry to every training sample
    #: (core/symmetry.py) — 8x effective data from symmetric rulesets.
    augment_symmetry: bool = True
    mcts: MCTSConfig = field(default_factory=lambda: MCTSConfig(num_simulations=64))
    selfplay: SelfPlayConfig = field(default_factory=SelfPlayConfig)


def run_loop(env: TaflEnv, config: LoopConfig, log: Optional[MetricsLogger] = None):
    """Run the full AlphaZero iteration cycle; returns the final TrainState."""
    log = log or MetricsLogger()
    net = make_network(env.n, channels=config.channels, blocks=config.blocks)
    optimizer = make_optimizer(learning_rate=config.learning_rate)
    rng = jax.random.PRNGKey(config.seed)
    rng, init_rng = jax.random.split(rng)
    train_state = init_train_state(
        net, init_rng, env.num_observation_planes, optimizer
    )
    evaluate = jax.jit(lambda p, obs: net.apply(p, obs))

    replay = ReplayBuffer(env, config.replay_capacity, config.selfplay.policy_k)
    build_batch = make_batch_builder(env)
    train_step = jax.jit(make_train_step(net, optimizer))
    actor = SelfPlayActor(env, evaluate, config.mcts, config.selfplay)
    np_rng = np.random.RandomState(config.seed)

    from ..core.symmetry import random_symmetry_batch

    augment = jax.jit(random_symmetry_batch)

    ckpt = (
        CheckpointManager(config.checkpoint_dir)
        if config.checkpoint_dir
        else None
    )
    start_iter = 0
    if ckpt is not None and ckpt.latest_iteration() is not None:
        start_iter, train_state, rng, _ = ckpt.restore(train_state, replay)
        start_iter += 1
        log.scalar("resume/iteration", start_iter)

    incumbent_params = train_state.params

    for it in range(start_iter, config.iterations):
        t0 = time.perf_counter()
        rng, sp_rng = jax.random.split(rng)
        stats = actor.play(
            train_state.params, replay, sp_rng, config.games_per_iteration
        )
        sp_time = time.perf_counter() - t0
        for k, v in stats.as_dict().items():
            log.scalar(f"selfplay/{k}", v, step=it)
        log.scalar("selfplay/games_per_hour", stats.games / max(sp_time, 1e-9) * 3600, step=it)

        metrics = {}
        t1 = time.perf_counter()
        if replay.size >= config.min_replay_size:
            for _ in range(config.train_steps_per_iteration):
                s = replay.sample(np_rng, config.train_batch_size)
                board = jnp.asarray(s.board)
                policy_idx = jnp.asarray(s.policy_idx)
                if config.augment_symmetry:
                    rng, a_rng = jax.random.split(rng)
                    board, policy_idx = augment(a_rng, board, policy_idx)
                batch = build_batch(
                    board,
                    jnp.asarray(s.side),
                    jnp.asarray(s.reps),
                    policy_idx,
                    jnp.asarray(s.policy_p),
                    jnp.asarray(s.value),
                )
                train_state, metrics = train_step(train_state, batch)
            for k, v in metrics.items():
                log.scalar(f"train/{k}", float(v), step=it)
        train_time = time.perf_counter() - t1

        if config.arena_games > 0 and it > 0:
            rng, a_rng = jax.random.split(rng)
            arena_cfg = MCTSConfig(
                num_simulations=config.arena_sims,
                max_children=config.mcts.max_children,
                cpuct=config.mcts.cpuct,
                dirichlet_eps=0.0,
            )
            result = play_match(
                env,
                evaluate,
                train_state.params,
                incumbent_params,
                arena_cfg,
                num_games=config.arena_games,
                rng=a_rng,
            )
            for k, v in result.as_dict().items():
                log.scalar(f"arena/{k}", float(v), step=it)
            if result.score >= config.gate_threshold:
                incumbent_params = train_state.params
                log.scalar("arena/promoted", 1.0, step=it)
            else:
                log.scalar("arena/promoted", 0.0, step=it)

        log.scalar("time/selfplay_s", sp_time, step=it)
        log.scalar("time/train_s", train_time, step=it)
        log.scalar("replay/size", replay.size, step=it)
        log.flush(step=it)

        if ckpt is not None and (it + 1) % config.checkpoint_every == 0:
            ckpt.save(it, train_state, replay, rng)

    return train_state
