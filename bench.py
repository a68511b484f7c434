"""Headline benchmark: env-steps/s/chip on 11x11 Copenhagen Hnefatafl.

BASELINE.md config 3: 4096 lockstep games with full capture/surround rules,
random-legal-action policy, auto-reset — one jit-compiled scan stepping the
whole batch on device. Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The reference publishes no benchmarks (BASELINE.md); vs_baseline is measured
against the driver's north-star target of 100k env-steps/s/chip.
"""

import json
import time

import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core.env import make_env

TARGET_STEPS_PER_S = 100_000.0


def build_rollout(env, batch: int, chunk: int):
    def policy_step(carry, _):
        state, rng = carry
        rng, k = jax.random.split(rng)
        mask = jax.vmap(env.legal_mask)(state)
        noise = jax.random.uniform(k, mask.shape, dtype=jnp.float32)
        action = jnp.argmax(mask * noise, axis=-1).astype(jnp.int32)
        state, info = jax.vmap(lambda s, a: env.step(s, a, validate=False))(
            state, action
        )
        # Auto-reset finished games so the batch stays saturated.
        fresh = env.reset_batch(batch)
        done = state.terminated

        def where_done(f, c):
            d = done.reshape(done.shape + (1,) * (c.ndim - 1))
            return jnp.where(d, f, c)

        state = jax.tree_util.tree_map(where_done, fresh, state)
        return (state, rng), info.terminated.sum()

    def rollout(state, rng):
        (state, rng), dones = jax.lax.scan(
            policy_step, (state, rng), None, length=chunk
        )
        return state, rng, dones.sum()

    return jax.jit(rollout)


def main():
    backend = jax.default_backend()
    on_accel = backend != "cpu"
    batch = 4096 if on_accel else 256
    chunk = 32 if on_accel else 8
    iters = 8 if on_accel else 2

    env = make_env("copenhagen")
    state = env.reset_batch(batch)
    rng = jax.random.PRNGKey(0)
    rollout = build_rollout(env, batch, chunk)

    # Warmup / compile.
    state, rng, _ = rollout(state, rng)
    jax.block_until_ready(state.board)

    t0 = time.perf_counter()
    total_done = 0
    for _ in range(iters):
        state, rng, dones = rollout(state, rng)
    jax.block_until_ready(state.board)
    dt = time.perf_counter() - t0

    steps = batch * chunk * iters
    steps_per_s = steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_11x11",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / TARGET_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
