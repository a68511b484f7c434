"""Differential tests for the fused pallas step kernel.

``TaflEnv.step_batch`` (kernel array phase + shared finisher) must match
``vmap(TaflEnv.step)`` field-for-field on random playouts. On the CPU suite
the kernel runs in interpret mode; under ``TAFL_TEST_PLATFORM=tpu`` every
test here also runs the COMPILED Mosaic kernel (tests/conftest.py
``kernel_interpret_modes``), so lowering regressions fail the suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core.env import make_env
from tests.conftest import kernel_interpret_modes

STATE_FIELDS = [
    "board",
    "side_to_play",
    "reps",
    "mid_pair",
    "recent_plays",
    "rep_first_i",
    "plays_since_capture",
    "turn",
    "terminated",
    "result",
    "reason",
]
INFO_FIELDS = [
    "captures",
    "n_captures",
    "terminated",
    "result",
    "reason",
    "reward_mover",
    "legal_mask",
    "invalid",
]


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
@pytest.mark.parametrize("preset", ["brandubh", "copenhagen", "tablut", "magpie"])
def test_step_batch_matches_vmap_step(preset, interpret):
    env = make_env(preset)
    B, steps = 6, 24
    rng = np.random.RandomState(hash(preset) % (2**31))
    states = env.reset_batch(B)
    vstep = jax.jit(
        lambda s, a: jax.vmap(lambda ss, aa: env.step(ss, aa, validate=False))(s, a)
    )
    kstep = jax.jit(lambda s, a: env.step_batch(s, a, interpret=interpret))
    mask_fn = jax.jit(jax.vmap(env.legal_mask))

    for t in range(steps):
        m = np.asarray(mask_fn(states))
        acts = jnp.asarray(
            [
                int(rng.choice(np.nonzero(m[b])[0])) if m[b].any() else 0
                for b in range(B)
            ],
            jnp.int32,
        )
        s_ref, i_ref = vstep(states, acts)
        s_got, i_got = kstep(states, acts)
        for name in STATE_FIELDS:
            a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_got, name))
            assert np.array_equal(a, b), f"{preset} step {t} state.{name}"
        for name in INFO_FIELDS:
            a, b = np.asarray(getattr(i_ref, name)), np.asarray(getattr(i_got, name))
            assert np.array_equal(a, b), f"{preset} step {t} info.{name}"
        states = s_ref
        done = np.asarray(states.terminated)
        if done.any():
            fresh = env.reset_batch(B)
            d = jnp.asarray(done)
            states = jax.tree_util.tree_map(
                lambda f, c: jnp.where(
                    d.reshape((-1,) + (1,) * (c.ndim - 1)), f, c
                ),
                fresh,
                states,
            )


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
def test_step_batch_shieldwall_fixture(interpret):
    """The corner-closing shieldwall fixture through the fused kernel
    (game/game/logic.rs:1108-1123)."""
    from alphazeroforhnefatafl_tpu.core import actions as A
    from alphazeroforhnefatafl_tpu.core.env import TaflEnv
    from alphazeroforhnefatafl_tpu.core.rules import COPENHAGEN

    env = TaflEnv(COPENHAGEN, "9/9/9/9/6t2/7tT/7tT/7tT/9")
    state = env.reset()  # attacker to move
    states = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), state)
    action = jnp.asarray([A.encode_from_tiles(9, (4, 6), (4, 8))], jnp.int32)
    _, info = jax.jit(lambda s, a: env.step_batch(s, a, interpret=interpret))(states, action)
    caps = {tuple(t) for t in np.argwhere(np.asarray(info.captures[0]))}
    assert caps == {(5, 8), (6, 8), (7, 8)}


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
def test_step_batch_exit_fort_fixture(interpret):
    """A defender move completing a bulge exit fort (logic.rs:1215-1233)
    through the fused kernel must end the game with an ExitFort win."""
    from alphazeroforhnefatafl_tpu.core import actions as A
    from alphazeroforhnefatafl_tpu.core.env import TaflEnv, WIN_DEFENDER
    from alphazeroforhnefatafl_tpu.core.rules import COPENHAGEN, WinReason

    env = TaflEnv(COPENHAGEN, "4t4/1t7/9/9/5T3/6TTT/5T2K/6TTT/9")
    state = env.reset().replace(side_to_play=jnp.int32(1))
    states = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), state)
    action = jnp.asarray([A.encode_from_tiles(9, (4, 5), (5, 5))], jnp.int32)
    ns, info = jax.jit(lambda s, a: env.step_batch(s, a, interpret=interpret))(states, action)
    assert not bool(info.invalid[0])
    assert int(ns.result[0]) == WIN_DEFENDER
    assert int(ns.reason[0]) == int(WinReason.EXIT_FORT)


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
def test_step_batch_dense_boards(interpret):
    """Dense random boards fire captures/shieldwalls/flood-fill outcomes far
    more often than playouts from the start position; the kernel must match
    vmap(step) on them field-for-field."""
    from tests.test_env_golden import random_dense_board

    env = make_env("copenhagen")
    n = env.n
    rng = np.random.RandomState(7)
    B = 8
    vstep = jax.jit(
        lambda s, a: jax.vmap(lambda ss, aa: env.step(ss, aa, validate=False))(s, a)
    )
    kstep = jax.jit(lambda s, a: env.step_batch(s, a, interpret=interpret))
    mask_fn = jax.jit(jax.vmap(env.legal_mask))

    for round_i in range(4):
        boards = np.stack([random_dense_board(rng, n) for _ in range(B)])
        side = rng.randint(0, 2)
        base = env.reset_batch(B)
        states = base.replace(
            board=jnp.asarray(boards, jnp.int8),
            side_to_play=jnp.full((B,), side, jnp.int32),
        )
        m = np.asarray(mask_fn(states))
        acts = jnp.asarray(
            [
                int(rng.choice(np.nonzero(m[b])[0])) if m[b].any() else 0
                for b in range(B)
            ],
            jnp.int32,
        )
        s_ref, i_ref = vstep(states, acts)
        s_got, i_got = kstep(states, acts)
        for name in STATE_FIELDS:
            a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_got, name))
            assert np.array_equal(a, b), f"round {round_i} state.{name}"
        for name in INFO_FIELDS:
            a, b = np.asarray(getattr(i_ref, name)), np.asarray(getattr(i_got, name))
            assert np.array_equal(a, b), f"round {round_i} info.{name}"


@pytest.mark.parametrize("interpret", kernel_interpret_modes())
def test_step_batch_repetition_loss_fixture(interpret):
    """The repetition-loss sequence (logic.rs:1405-1421) played entirely
    through the fused kernel: the in-kernel ring/mid-pair tracker must call
    the game at the exact same ply as the oracle (defender wins, attacker
    repeated 3x)."""
    from alphazeroforhnefatafl_tpu.core import fen as F
    from alphazeroforhnefatafl_tpu.core import actions as A
    from alphazeroforhnefatafl_tpu.core.env import WIN_DEFENDER, make_env
    from alphazeroforhnefatafl_tpu.core.rules import WinReason

    env = make_env("brandubh")
    state = env.reset_batch(1)
    kstep = jax.jit(lambda s, a: env.step_batch(s, a, interpret=interpret))

    def play(mv):
        src, dst = mv.split("-")
        aid = A.encode_from_tiles(
            7, F.tile_from_str(src), F.tile_from_str(dst)
        )
        return kstep(play.state, jnp.asarray([aid], jnp.int32))

    play.state = state
    moves = ["d6-f6", "d5-f5", "f6-d6", "f5-d5"] * 3
    for mv in moves:
        play.state, info = play(mv)
        assert not bool(info.invalid[0]), mv
        assert not bool(play.state.terminated[0]), mv
    play.state, info = play("d6-f6")
    assert bool(play.state.terminated[0])
    assert int(play.state.result[0]) == WIN_DEFENDER
    assert int(play.state.reason[0]) == int(WinReason.REPETITION)
