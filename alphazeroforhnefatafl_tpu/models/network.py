"""Policy/value networks for tafl AlphaZero.

The reference intended a libtorch NN backend (``tch = "0.18.1"`` in
``/root/reference/Cargo.toml:8``) behind the ``nnet.predict(board) ->
(policy, value)`` boundary of its MCTS (``src/mcts.py:85``) but contains zero
NN code; this module supplies that component, TPU-first:

- NHWC layout and bfloat16 compute (f32 params, f32 heads) so convolutions
  tile onto the MXU.
- GroupNorm instead of BatchNorm: stateless, so the apply function stays a
  pure ``params -> logits`` map under jit/pjit with no mutable batch stats.
- The policy head is a convolution to ``4*(N-1)`` move planes whose flatten
  order matches the action encoding (from-tile major, then direction, then
  distance — see :mod:`alphazeroforhnefatafl_tpu.core.actions`), keeping the
  whole policy in one fused reshape instead of a giant dense layer.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(y)
        return nn.relu(x + y)


class NFResBlock(nn.Module):
    """Norm-free residual block (SkipInit / NFNet-style).

    A round-2 profiler trace put the NN forward at ~1.5 ms/wave with
    GroupNorm's many medium cross-channel reductions dominating — the MXU
    idles while the VPU reduces (docs/ROADMAP.md #5). This block removes the
    norms entirely: pre-activation convs with a per-block learnable scalar
    branch gain initialized at 0 (SkipInit, De & Smith 2020), so the network
    starts as the identity and signal variance cannot explode with depth.
    The residual stream stays un-normalized, which XLA fuses into pure
    conv+elementwise chains.
    """

    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(y)
        gain = self.param("skip_gain", nn.initializers.zeros, (1,), jnp.float32)
        return x + gain.astype(self.dtype) * y


class PolicyValueNet(nn.Module):
    """AlphaZero-style residual policy/value network.

    Input: ``float32[B, N, N, C_in]`` observation planes (``TaflEnv.observe``).
    Output: ``(policy_logits[B, A], value[B])`` with ``A = N*N*4*(N-1)`` and
    value in [-1, 1] from the perspective of the player to move (the negamax
    convention of the reference MCTS, ``src/mcts.py:67-69``).
    """

    board_size: int
    channels: int = 64
    blocks: int = 6
    value_hidden: int = 128
    dtype: Any = jnp.bfloat16
    #: "group" (GroupNorm blocks) or "none" (norm-free :class:`NFResBlock`
    #: trunk — no cross-channel reductions in the hot forward).
    norm: str = "group"

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        n = self.board_size
        norm_free = self.norm == "none"
        x = x.astype(self.dtype)
        if norm_free:
            x = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(x)
            for _ in range(self.blocks):
                x = NFResBlock(self.channels, dtype=self.dtype)(x)
            x = nn.relu(x)
        else:
            x = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(x)
            x = nn.relu(x)
            for _ in range(self.blocks):
                x = ResBlock(self.channels, dtype=self.dtype)(x)

        # Policy head: one output plane per (direction, distance) pair, in the
        # action-encoding order dir-major then distance.
        move_planes = 4 * (n - 1)
        # Bias only on the norm-free path: GroupNorm would cancel it (and the
        # group tree must stay byte-compatible with pre-round-3 checkpoints);
        # without a norm the conv bias is the head's only offset term.
        p = nn.Conv(self.channels, (3, 3), use_bias=norm_free, dtype=self.dtype)(x)
        if not norm_free:
            p = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(p)
        p = nn.relu(p)
        p = nn.Conv(move_planes, (1, 1), dtype=jnp.float32)(p)
        policy_logits = p.reshape(p.shape[0], n * n * move_planes)

        # Value head.
        v = nn.Conv(8, (1, 1), dtype=jnp.float32)(x.astype(jnp.float32))
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.Dense(self.value_hidden, dtype=jnp.float32)(v)
        v = nn.relu(v)
        v = nn.Dense(1, dtype=jnp.float32)(v)
        value = jnp.tanh(v)[:, 0]
        return policy_logits, value


def make_network(
    board_size: int, channels: int = 64, blocks: int = 6, norm: str = "group"
) -> PolicyValueNet:
    return PolicyValueNet(
        board_size=board_size, channels=channels, blocks=blocks, norm=norm
    )


def init_params(net: PolicyValueNet, rng: jax.Array, num_planes: int):
    n = net.board_size
    dummy = jnp.zeros((1, n, n, num_planes), dtype=jnp.float32)
    return net.init(rng, dummy)


# The masked-softmax-with-uniform-fallback of the reference
# (``src/mcts.py:83-102``) lives in ``search.mcts._masked_priors`` — the one
# search-side implementation; a near-duplicate NN-side copy here was dead
# code and a drift hazard, removed.
