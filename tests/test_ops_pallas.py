"""Differential tests for the pallas legal-mask kernel.

On the CPU suite the kernel runs in interpret mode; under
``TAFL_TEST_PLATFORM=tpu`` the same tests also run the COMPILED Mosaic
kernel (tests/conftest.py ``kernel_interpret_modes``). Truth is the
pure-JAX ray scan, itself differentially tested against the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core.env import make_env
from alphazeroforhnefatafl_tpu.core.rules import CELL_ATT, CELL_DEF, CELL_KING, EMPTY
from alphazeroforhnefatafl_tpu.ops.legal_mask import batched_legal_mask
from tests.conftest import kernel_interpret_modes


def random_boards(rng, n, B):
    boards = np.zeros((B, n, n), np.int8)
    for b in range(B):
        density = rng.uniform(0.1, 0.45)
        cells = rng.rand(n, n) < density
        sides_r = rng.rand(n, n) < 0.5
        boards[b][cells & sides_r] = CELL_ATT
        boards[b][cells & ~sides_r] = CELL_DEF
        for rc in [(0, 0), (0, n - 1), (n - 1, 0), (n - 1, n - 1), (n // 2, n // 2)]:
            boards[b][rc] = EMPTY
        empt = np.argwhere(boards[b] == EMPTY)
        kr, kc = empt[rng.randint(len(empt))]
        boards[b][kr, kc] = CELL_KING
    return boards


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
@pytest.mark.parametrize("preset", ["copenhagen", "brandubh", "tablut", "magpie"])
def test_pallas_mask_matches_jax(preset, interpret):
    env = make_env(preset)
    n = env.n
    rng = np.random.RandomState(42)
    B = 7  # deliberately not a multiple of the 128-lane block
    boards = random_boards(rng, n, B)
    sides = rng.randint(0, 2, size=B).astype(np.int32)

    ref = jax.vmap(env.legal_mask_for_side)(jnp.asarray(boards), jnp.asarray(sides))
    got = batched_legal_mask(
        env, jnp.asarray(boards), jnp.asarray(sides), interpret=interpret
    )
    assert np.array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
def test_pallas_mask_start_positions(interpret):
    env = make_env("copenhagen")
    B = 5
    state = env.reset_batch(B)
    ref = jax.vmap(env.legal_mask_for_side)(state.board, state.side_to_play)
    got = batched_legal_mask(env, state.board, state.side_to_play, interpret=interpret)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
