"""Replay buffer for self-play positions.

Successor of the reference's replay sketch — a bounded FIFO text file of
(matrix, mask, value1, value2) entries (``/root/reference/game/main.rs:86-132``,
eviction at ``:103-106``). Here: a host-side ring of compact positions
(int8 boards, sparse policy targets) with uniform sampling; observation
planes, dense policy targets and legal masks are reconstructed on device at
sample time, so the buffer stores ~200 bytes per position instead of dense
``A``-sized vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.env import TaflEnv
from .learner import Batch


@dataclass
class ReplaySample:
    board: np.ndarray  # i8[B, N, N]
    side: np.ndarray  # i8[B]
    reps: np.ndarray  # i8[B] repetition count of the side to move
    policy_idx: np.ndarray  # i32[B, K] action ids (-1 pad)
    policy_p: np.ndarray  # f32[B, K]
    value: np.ndarray  # f32[B]


class ReplayBuffer:
    """Uniform-sampling ring buffer of compact positions."""

    def __init__(self, env: TaflEnv, capacity: int, policy_k: int):
        n = env.n
        self.env = env
        self.capacity = capacity
        self.policy_k = policy_k
        self.board = np.zeros((capacity, n, n), np.int8)
        self.side = np.zeros((capacity,), np.int8)
        self.reps = np.zeros((capacity,), np.int8)
        self.policy_idx = np.full((capacity, policy_k), -1, np.int32)
        self.policy_p = np.zeros((capacity, policy_k), np.float32)
        self.value = np.zeros((capacity,), np.float32)
        self.write = 0
        self.size = 0
        self.total_added = 0

    def add(
        self,
        board: np.ndarray,
        side: np.ndarray,
        reps: np.ndarray,
        policy_idx: np.ndarray,
        policy_p: np.ndarray,
        value: np.ndarray,
    ) -> None:
        """Append a batch of positions, evicting the oldest on overflow
        (the FIFO semantics of ``write_to_file``, ``game/main.rs:103-106``)."""
        m = board.shape[0]
        idx = (self.write + np.arange(m)) % self.capacity
        self.board[idx] = board
        self.side[idx] = side
        self.reps[idx] = reps
        k = min(policy_idx.shape[1], self.policy_k)
        self.policy_idx[idx, :k] = policy_idx[:, :k]
        self.policy_idx[idx, k:] = -1
        self.policy_p[idx, :k] = policy_p[:, :k]
        self.policy_p[idx, k:] = 0
        self.value[idx] = value
        self.write = int((self.write + m) % self.capacity)
        self.size = int(min(self.size + m, self.capacity))
        self.total_added += int(m)

    def sample(self, rng: np.random.RandomState, batch_size: int) -> ReplaySample:
        idx = rng.randint(0, self.size, size=batch_size)
        return ReplaySample(
            board=self.board[idx],
            side=self.side[idx],
            reps=self.reps[idx],
            policy_idx=self.policy_idx[idx],
            policy_p=self.policy_p[idx],
            value=self.value[idx],
        )


def make_batch_builder(env: TaflEnv):
    """Jitted device-side reconstruction: compact sample -> training Batch.

    Rebuilds observation planes, the legal-action mask (via the env's ray
    scan) and the dense policy target from the sparse top-K representation.
    """

    def build(board, side, reps, policy_idx, policy_p, value) -> Batch:
        b = board.shape[0]
        A = env.num_actions

        def one_obs(bd, sd, rp):
            state = env.reset().replace(
                board=bd.astype(jnp.int8),
                side_to_play=sd.astype(jnp.int32),
                reps=jnp.zeros((2,), jnp.int32).at[sd.astype(jnp.int32)].set(
                    rp.astype(jnp.int32)
                ),
            )
            return env.observe(state), env.legal_mask_for_side(
                bd.astype(jnp.int8), sd.astype(jnp.int32)
            )

        obs, legal = jax.vmap(one_obs)(board, side, reps)
        valid = policy_idx >= 0
        target = jnp.zeros((b, A), jnp.float32)
        rows = jnp.arange(b)[:, None]
        target = target.at[rows, jnp.maximum(policy_idx, 0)].add(
            jnp.where(valid, policy_p, 0.0)
        )
        return Batch(
            obs=obs,
            policy_target=target,
            value_target=value.astype(jnp.float32),
            legal_mask=legal,
        )

    return jax.jit(build)
