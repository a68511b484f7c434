"""Net-free anchor opponents for externally-grounded Elo ladders.

A run's own ladder entries (init, iterN, ...) drift with the run: "+311 Elo
over init" is not comparable across runs or rounds. These anchors are fixed
points OUTSIDE any run:

- ``uniform``: uniform-prior MCTS — the reference's own net-free search
  (``src/mcts.py:83-102``: when the net's masked policy is all-zero it falls
  back to uniform-over-legal priors; with zero logits and zero values the
  whole search IS that fallback, guided only by terminal values found in the
  tree).
- ``material``: uniform priors + a piece-count value (normalized by each
  side's starting strength) — a weak classical evaluator.
- ``random``: plays an arbitrary-but-deterministic legal move per position
  (huge pseudo-random priors swamp the search), i.e. a random-legal bot
  that is reproducible for Elo fitting.

Every ladder entry — net checkpoints included — is wrapped as
``{"net": params, "anchor": code}`` so anchors and checkpoints share one
pytree structure, which ``play_match``'s stacked-params pairing requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ANCHOR_NET = 0
ANCHOR_UNIFORM = 1
ANCHOR_MATERIAL = 2
ANCHOR_RANDOM = 3

ANCHOR_CODES = {
    "uniform": ANCHOR_UNIFORM,
    "material": ANCHOR_MATERIAL,
    "random": ANCHOR_RANDOM,
}


def anchor_params(base_params, code: int):
    """Wrap net params (or a structural placeholder for pure anchors) with
    an anchor code selecting the evaluation behavior."""
    return {"net": base_params, "anchor": jnp.int32(code)}


def make_anchored_evaluate(net_apply, env):
    """An ``evaluate(params, obs)`` accepting :func:`anchor_params` trees.

    ``code == ANCHOR_NET`` runs the real net; other codes replace the
    policy/value with the net-free anchor behaviors above. The net forward
    still runs for anchors (its output is masked out) — ladder batches are
    small, and one shared computation graph keeps ``play_match``'s cached
    move executable valid for every pairing.
    """
    # Starting piece counts normalize material advantage per preset.
    start = env.reset()
    board = start.board
    n_att0 = float(jnp.sum(board == 1))
    n_def0 = float(jnp.sum((board == 2) | (board == 3)))
    base_key = jax.random.PRNGKey(0xA11C)

    def evaluate(params, obs):
        code = params["anchor"]
        logits, value = net_apply(params["net"], obs)
        B = obs.shape[0]

        # material: mover-perspective normalized piece advantage.
        att = jnp.sum(obs[..., 0], axis=(1, 2))
        deff = jnp.sum(obs[..., 1], axis=(1, 2))
        side = obs[:, 0, 0, 4]  # 0 attacker / 1 defender to move
        att_adv = att / n_att0 - deff / n_def0
        mat_value = jnp.tanh(1.5 * jnp.where(side == 0, att_adv, -att_adv))

        # random: per-position pseudo-random priors, deterministic in the
        # position (obs hash folds into a fixed key). The x1e4 scale swamps
        # Q/exploration terms, so the search plays the masked argmax — an
        # arbitrary legal move.
        h = jnp.sum(
            obs.reshape(B, -1)
            * jnp.arange(1, obs[0].size + 1, dtype=jnp.float32)[None, :],
            axis=-1,
        ).astype(jnp.int32)
        keys = jax.vmap(lambda hh: jax.random.fold_in(base_key, hh))(h)
        rand_logits = (
            jax.vmap(lambda k: jax.random.uniform(k, (logits.shape[-1],)))(keys)
            * 1e4
        )

        out_logits = jnp.where(
            code == ANCHOR_NET,
            logits,
            jnp.where(code == ANCHOR_RANDOM, rand_logits, jnp.zeros_like(logits)),
        )
        out_value = jnp.where(
            code == ANCHOR_NET,
            value,
            jnp.where(code == ANCHOR_MATERIAL, mat_value, jnp.zeros((B,))),
        )
        return out_logits, out_value

    return evaluate
