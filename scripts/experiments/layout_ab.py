"""Round-4 experiment: kill the per-wave {2,0,1}->{2,1,0} layout copies.

The round-4 trace attributed 3.86 ms/wave (31%) to three [1024,801,128]
layout-conversion copies of child_N/child_W/child_node inside the wave
scan: the chunked driver's program boundaries inherit a {2,0,1} layout
from _root_setup, while the backup scatters lower to flat {2,1,0} views,
so XLA re-lays the three buffers out EVERY wave. Variants:

  base   — round-3 defaults (dot node-read, scatter backup)
  dense  — backup="dense" (einsum add: layout-agnostic, no scatter)
  pin    — row-major Format constraints on the chunk jits' tree leaves

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/layout_ab.py --variant pin
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from alphazeroforhnefatafl_tpu.core.env import make_env
from alphazeroforhnefatafl_tpu.models.network import init_params, make_network
from alphazeroforhnefatafl_tpu.search import mcts as M


def run_variant(variant: str, batch=1024, sims=800, children=128, chunk=100, iters=3):
    env = make_env("copenhagen")
    net = make_network(env.n, channels=64, blocks=6)
    params = init_params(net, jax.random.PRNGKey(0), env.num_observation_planes)
    cfg = M.MCTSConfig(
        num_simulations=sims,
        max_children=children,
        dirichlet_eps=0.0,
        backup="dense" if variant == "dense" else "auto",
    )
    mcts = M.MCTS(env, lambda p, o: net.apply(p, o), cfg)

    if variant == "pin":
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        dev = jax.devices()[0]

        def fmt_tree(tree_like):
            def one(x):
                nd = getattr(x, "ndim", None)
                if nd is None or nd == 0:
                    return None
                return Format(Layout(tuple(range(nd))), SingleDeviceSharding(dev))

            return jax.tree_util.tree_map(one, tree_like)

        state0 = env.reset_batch(batch)
        legal0 = jax.jit(jax.vmap(env.legal_mask))(state0)
        tree0, aux0 = jax.eval_shape(
            lambda p, s, l, r: mcts._root_setup(p, s, l, r, False),
            params, state0, legal0, jax.random.PRNGKey(1),
        )
        tfmt = fmt_tree(tree0)
        mcts._chunk_jit = {
            "setup": jax.jit(
                mcts._root_setup,
                static_argnames="add_noise",
                out_shardings=(tfmt, fmt_tree(aux0)),
            ),
            "scan": jax.jit(
                mcts._wave_scan,
                in_shardings=(None, tfmt, fmt_tree(aux0), None, None),
                out_shardings=(tfmt, None),
            ),
            "final": jax.jit(
                mcts._finalize,
                in_shardings=(tfmt, fmt_tree(aux0), None),
            ),
        }

    state = env.reset_batch(batch)
    legal = jax.jit(jax.vmap(env.legal_mask))(state)

    def run(rng):
        res = mcts.search_in_chunks(params, state, legal, rng, add_noise=False, chunk=chunk)
        return jnp.sum(res.root_visits) + jnp.sum(res.action_probs)

    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    np.asarray(run(rng))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        np.asarray(run(sub))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "variant": variant,
        "sims_per_s": round(batch * sims / best, 1),
        "best_ms": round(best * 1e3, 1),
        "iter_ms": [round(t * 1e3, 1) for t in times],
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True, choices=["base", "dense", "pin"])
    p.add_argument("--sims", type=int, default=800)
    p.add_argument("--children", type=int, default=128)
    p.add_argument("--chunk", type=int, default=100)
    a = p.parse_args()
    run_variant(a.variant, sims=a.sims, children=a.children, chunk=a.chunk)
