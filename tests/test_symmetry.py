"""D4 symmetry augmentation correctness.

The decisive property: transforming a board and permuting its legal-action
mask with the same transform must commute — ``mask(T(board)) ==
perm_T(mask(board))`` — for every transform, preset and side. This pins both
the board transform and the action permutation at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core import symmetry
from alphazeroforhnefatafl_tpu.core.env import make_env
from tests.test_env_golden import random_dense_board


@pytest.mark.parametrize("preset", ["copenhagen", "brandubh", "tablut"])
def test_mask_commutes_with_symmetry(preset):
    env = make_env(preset)
    n = env.n
    rng = np.random.RandomState(5)
    board = random_dense_board(rng, n)
    perms = symmetry.action_permutations(n)
    mask_fn = jax.jit(env.legal_mask_for_side)

    for side in (0, 1):
        base = np.asarray(mask_fn(jnp.asarray(board, jnp.int8), jnp.int32(side)))
        for t in range(symmetry.NUM_TRANSFORMS):
            tb = np.asarray(symmetry.transform_board(jnp.asarray(board, jnp.int8), t))
            got = np.asarray(mask_fn(jnp.asarray(tb), jnp.int32(side)))
            expect = np.zeros_like(base)
            expect[perms[t]] = base
            assert np.array_equal(got, expect), f"t={t} side={side}"


def test_permutations_are_bijections():
    perms = symmetry.action_permutations(7)
    for t in range(symmetry.NUM_TRANSFORMS):
        assert np.array_equal(np.sort(perms[t]), np.arange(perms.shape[1])), t


def test_random_symmetry_batch_consistency():
    env = make_env("brandubh")
    n = env.n
    rng = np.random.RandomState(1)
    B, K = 8, 8
    boards = np.stack([random_dense_board(rng, n) for _ in range(B)])
    mask_fn = jax.jit(jax.vmap(env.legal_mask_for_side))
    sides = jnp.zeros((B,), jnp.int32)
    masks = np.asarray(mask_fn(jnp.asarray(boards, jnp.int8), sides))
    # Sparse indices: first K legal actions per sample.
    idx = np.full((B, K), -1, np.int32)
    for b in range(B):
        legal = np.nonzero(masks[b])[0][:K]
        idx[b, : len(legal)] = legal

    tb, ti = symmetry.random_symmetry_batch(
        jax.random.PRNGKey(0), jnp.asarray(boards, jnp.int8), jnp.asarray(idx)
    )
    masks_t = np.asarray(mask_fn(tb, sides))
    ti = np.asarray(ti)
    for b in range(B):
        for j in range(K):
            if idx[b, j] >= 0:
                assert masks_t[b, ti[b, j]], (b, j)
            else:
                assert ti[b, j] == -1
