"""Dihedral (D4) board/action symmetries for training augmentation.

Tafl boards, rules and all shipped presets are symmetric under the 8
rotations/reflections of the square (throne at the center, corners mapped to
corners, hostility isotropic), so every self-play position yields 8
equivalent training samples. The reference has no training loop and hence no
augmentation; this is the standard AlphaZero-style exploitation of board
symmetry, adapted to the ``(from_tile, direction, distance)`` action
encoding (``core/actions.py``): a transform permutes the from-tile and the
direction and leaves the distance unchanged.

Transforms are indexed 0..7: ``t = flip * 4 + k`` meaning "rotate 90 degrees
counterclockwise k times, then (if flip) flip up-down".
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

NUM_TRANSFORMS = 8

# Direction order: up, down, left, right (core.actions.DIR_OFFSETS).
# After one CCW rot90 (as np.rot90: (r, c) -> (n-1-c, r)), a move that went
# "up" now goes "left", etc.
_ROT_DIR = {0: 2, 1: 3, 2: 1, 3: 0}  # up->left, down->right, left->down, right->up
_FLIP_DIR = {0: 1, 1: 0, 2: 2, 3: 3}  # flipud swaps up/down


@functools.lru_cache(maxsize=None)
def action_permutations(n: int) -> np.ndarray:
    """``perm[t, a]`` = the action index of ``a`` after transform ``t``.

    A policy over the original board maps to the transformed board as
    ``policy_t[perm[t, a]] = policy[a]``.
    """
    ndist = n - 1
    A = n * n * 4 * ndist
    a = np.arange(A)
    per_tile = 4 * ndist
    fr, rem = np.divmod(a, per_tile)
    d, k = np.divmod(rem, ndist)
    r, c = np.divmod(fr, n)

    perms = np.zeros((NUM_TRANSFORMS, A), dtype=np.int32)
    for t in range(NUM_TRANSFORMS):
        flip, rot = divmod(t, 4)
        r2, c2, d2 = r.copy(), c.copy(), d.copy()
        for _ in range(rot):
            r2, c2 = n - 1 - c2, r2
            d2 = np.vectorize(_ROT_DIR.get)(d2)
        if flip:
            r2 = n - 1 - r2
            d2 = np.vectorize(_FLIP_DIR.get)(d2)
        perms[t] = ((r2 * n + c2) * 4 + d2) * ndist + k
    return perms


def transform_board(board: jax.Array, t: int) -> jax.Array:
    """Apply transform ``t`` (static) to a ``[..., N, N]`` board."""
    flip, rot = divmod(t, 4)
    out = jnp.rot90(board, rot, axes=(-2, -1))
    if flip:
        out = jnp.flip(out, axis=-2)
    return out


def all_board_transforms(board: jax.Array) -> jax.Array:
    """Stack of all 8 transforms of ``[..., N, N]`` -> ``[8, ..., N, N]``."""
    return jnp.stack([transform_board(board, t) for t in range(NUM_TRANSFORMS)])


def random_symmetry_batch(
    rng: jax.Array,
    boards: jax.Array,  # [B, N, N]
    policy_idx: jax.Array,  # i32[B, K] sparse action indices, -1 = empty
) -> Tuple[jax.Array, jax.Array]:
    """Apply an independent random D4 transform to each sample.

    Returns (transformed boards, transformed sparse policy indices). Values
    (policy_p, value, side, reps) are invariant under the symmetry.
    """
    n = boards.shape[-1]
    B = boards.shape[0]
    t = jax.random.randint(rng, (B,), 0, NUM_TRANSFORMS)
    variants = all_board_transforms(boards)  # [8, B, N, N]
    boards_t = jnp.take_along_axis(
        variants, t[None, :, None, None], axis=0
    )[0]
    perms = jnp.asarray(action_permutations(n))  # [8, A]
    per_sample = perms[t]  # [B, A]
    idx_t = jnp.take_along_axis(
        per_sample, jnp.maximum(policy_idx, 0), axis=1
    )
    idx_t = jnp.where(policy_idx >= 0, idx_t, -1)
    return boards_t, idx_t.astype(jnp.int32)
