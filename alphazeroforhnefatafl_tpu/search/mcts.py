"""On-device batched MCTS.

TPU-native re-design of the reference's AlphaZero MCTS (``src/mcts.py``, the
working Python version; ``src/mcts.rs`` is a non-compiling sketch of the same
algorithm). The recursive, dict-keyed search inverts into an iterative
array-tree program: a batch of B independent trees advances in lockstep, one
leaf per tree per simulation, with a single fused NN forward over all B
leaves per wave — everything inside one ``lax.scan`` under jit.

Semantics preserved from the reference (cited into ``src/mcts.py``):

- PUCT selection ``u = Q + cpuct * P * sqrt(Ns + EPS) / (1 + Nsa)`` with
  ``Q = 0`` for unvisited edges (``mcts.py:109-121``; the visited/unvisited
  formulas there coincide in this single expression).
- Leaf expansion: NN priors masked to legal actions and renormalized, with a
  uniform-over-legal fallback when everything masks to zero
  (``mcts.py:83-102``).
- Negamax values: a leaf/terminal value is from the perspective of that
  node's player to move and flips sign at every step up the path
  (``mcts.py:67-69, 125-136``).
- Incremental backup ``Q = (N*Q + v) / (N + 1)`` as running sums W/N
  (``mcts.py:127-135``); ``Ns`` incremented on interior path nodes only
  (``mcts.py:135``).
- Visit-count action probabilities with temperature, argmax one-hot with
  random tie-break at ``temp == 0`` (``mcts.py:28-53``).

Deliberate deviations, both standard for scale:

- Each tree node keeps at most ``max_children`` candidate actions — the
  highest-prior legal moves (action subsampling). With the default 128 this
  is exact for all but the widest tafl positions.
- Nodes are a tree, not the reference's transposition-merged hash map: two
  move orders reaching the same position get separate nodes.

Dirichlet root noise (AlphaZero-standard, absent from the reference's MCTS)
is available for self-play exploration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.env import EnvState, TaflEnv

EPS = 1e-8  # src/mcts.py:6
NEG_INF = jnp.float32(-1e30)


@dataclass(frozen=True)
class MCTSConfig:
    num_simulations: int = 128
    max_children: int = 128
    cpuct: float = 1.5  # args.cpuct in src/mcts.py:112
    dirichlet_alpha: float = 0.3
    dirichlet_eps: float = 0.25  # 0 disables root noise
    max_depth: int = 128
    #: Child-candidate selection: "exact" (lax.top_k), "approx"
    #: (lax.approx_max_k, recall>=0.99 — the TPU-native partial-reduce
    #: top-k; a full sort of the action space costs more than the rest of
    #: the simulation wave combined), or "auto" (approx on TPU, exact
    #: elsewhere). Only affects WHICH of the >max_children lowest-prior
    #: candidates are kept; exact/approx agree on clear-cut priors.
    topk: str = "auto"


class Tree(struct.PyTreeNode):
    """Array-tree for one game's search (batched with a leading B axis).

    ``M = num_simulations + 1`` node slots, ``K = max_children`` edge slots.
    """

    state: EnvState  # [M, ...] env state at each node
    expanded: jax.Array  # bool[M]
    terminal: jax.Array  # bool[M]
    terminal_value: jax.Array  # f32[M] value from node-mover's perspective
    node_N: jax.Array  # i32[M]  (Ns)
    child_action: jax.Array  # i32[M, K], -1 = empty slot
    child_prior: jax.Array  # f32[M, K]
    child_N: jax.Array  # i32[M, K]  (Nsa)
    child_W: jax.Array  # f32[M, K]  (Nsa * Qsa)
    child_node: jax.Array  # i32[M, K], -1 = not yet materialized
    n_nodes: jax.Array  # i32 next free slot


class SearchResult(struct.PyTreeNode):
    action_probs: jax.Array  # f32[B, A] visit-count policy
    root_value: jax.Array  # f32[B] mean root value (mover perspective)
    root_visits: jax.Array  # i32[B]
    tree: Any  # final Tree (batched), for inspection/reuse


def terminal_value(state: EnvState) -> jax.Array:
    """Value of a terminal state from the perspective of its player to move
    (``getGameEnded(board, 1)`` convention, ``src/mcts.py:77-81``)."""
    side = state.side_to_play
    return jnp.where(
        state.result == side,
        1.0,
        jnp.where(state.result == (1 - side), -1.0, 0.0),
    ).astype(jnp.float32)


def _masked_priors(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """Legal-masked, renormalized priors with uniform fallback
    (``src/mcts.py:83-102``)."""
    masked = jnp.where(legal, logits, NEG_INF)
    p = jax.nn.softmax(masked, axis=-1) * legal
    total = jnp.sum(p, axis=-1, keepdims=True)
    n_legal = jnp.maximum(jnp.sum(legal, axis=-1, keepdims=True), 1)
    return jnp.where(total > 0, p / jnp.maximum(total, 1e-30), legal / n_legal)


class MCTS:
    """Batched MCTS driver bound to an env and an evaluation function.

    ``evaluate(params, obs[B, N, N, C]) -> (logits[B, A], value[B])`` is the
    NN boundary (``nnet.predict``, ``src/mcts.py:85``).
    """

    def __init__(self, env: TaflEnv, evaluate: Callable, config: MCTSConfig):
        self.env = env
        self.evaluate = evaluate
        self.config = config
        self.num_nodes = config.num_simulations + 1
        self._approx_topk = config.topk == "approx" or (
            config.topk == "auto" and jax.devices()[0].platform == "tpu"
        )

    def _topk(self, priors: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self._approx_topk:
            return jax.lax.approx_max_k(
                priors, self.config.max_children, recall_target=0.99
            )
        return jax.lax.top_k(priors, self.config.max_children)

    # -------------------- tree construction --------------------

    def _empty_tree(self, root_state: EnvState) -> Tree:
        """Single-game empty tree with the root state in slot 0."""
        M, K = self.num_nodes, self.config.max_children
        states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (M,) + x.shape), root_state
        )
        return Tree(
            state=states,
            expanded=jnp.zeros((M,), bool),
            terminal=jnp.zeros((M,), bool).at[0].set(root_state.terminated),
            terminal_value=jnp.zeros((M,), jnp.float32)
            .at[0]
            .set(terminal_value(root_state)),
            node_N=jnp.zeros((M,), jnp.int32),
            child_action=jnp.full((M, K), -1, jnp.int32),
            child_prior=jnp.zeros((M, K), jnp.float32),
            child_N=jnp.zeros((M, K), jnp.int32),
            child_W=jnp.zeros((M, K), jnp.float32),
            child_node=jnp.full((M, K), -1, jnp.int32),
            n_nodes=jnp.int32(1),
        )

    def _expand_node(self, tree: Tree, node: jax.Array, priors: jax.Array) -> Tree:
        """Store the top-K prior actions as the node's candidate edges."""
        K = self.config.max_children
        top_p, top_a = self._topk(priors)
        has_mass = top_p > 0
        top_a = jnp.where(has_mass, top_a, -1)
        top_p = jnp.where(has_mass, top_p, 0.0)
        return tree.replace(
            expanded=tree.expanded.at[node].set(True),
            child_action=tree.child_action.at[node].set(top_a.astype(jnp.int32)),
            child_prior=tree.child_prior.at[node].set(top_p),
        )

    # -------------------- selection --------------------

    def _select_slot(self, tree: Tree, node: jax.Array) -> jax.Array:
        """PUCT argmax over the node's edge slots (``src/mcts.py:109-121``)."""
        N = tree.child_N[node]
        W = tree.child_W[node]
        P = tree.child_prior[node]
        Ns = tree.node_N[node].astype(jnp.float32)
        Q = jnp.where(N > 0, W / jnp.maximum(N, 1), 0.0)
        u = Q + self.config.cpuct * P * jnp.sqrt(Ns + EPS) / (1.0 + N)
        u = jnp.where(tree.child_action[node] >= 0, u, NEG_INF)
        return jnp.argmax(u).astype(jnp.int32)

    def _traverse(self, tree: Tree):
        """Walk from the root to a leaf edge without stepping the env.

        Returns (path_nodes, path_slots, depth, leaf_parent, leaf_slot,
        at_node_leaf, leaf_node): ``at_node_leaf`` means the walk stopped at
        an unexpanded-or-terminal node (no new edge); otherwise it stopped at
        an unmaterialized edge (child_node == -1).
        """
        D = self.config.max_depth
        path_nodes = jnp.full((D,), -1, jnp.int32)
        path_slots = jnp.full((D,), -1, jnp.int32)

        def cond(c):
            return ~c["done"]

        def body(c):
            node = c["node"]
            is_leaf_node = ~tree.expanded[node] | tree.terminal[node]

            slot = self._select_slot(tree, node)
            child = tree.child_node[node, slot]
            hit_edge = ~is_leaf_node & (child < 0)
            descend = ~is_leaf_node & (child >= 0)
            # Depth cap: treat as node leaf to keep the path buffer bounded.
            depth_capped = c["depth"] >= D - 1

            record = ~is_leaf_node
            d = c["depth"]
            path_nodes = c["path_nodes"].at[d].set(
                jnp.where(record, node, c["path_nodes"][d])
            )
            path_slots = c["path_slots"].at[d].set(
                jnp.where(record, slot, c["path_slots"][d])
            )
            new_depth = c["depth"] + record.astype(jnp.int32)

            done = is_leaf_node | hit_edge | (descend & depth_capped)
            return {
                "node": jnp.where(descend, child, node),
                "depth": new_depth,
                "done": done,
                "at_node_leaf": is_leaf_node | (descend & depth_capped),
                "leaf_parent": jnp.where(hit_edge, node, c["leaf_parent"]),
                "leaf_slot": jnp.where(hit_edge, slot, c["leaf_slot"]),
                "path_nodes": path_nodes,
                "path_slots": path_slots,
            }

        init = {
            "node": jnp.int32(0),
            "depth": jnp.int32(0),
            "done": jnp.asarray(False),
            "at_node_leaf": jnp.asarray(False),
            "leaf_parent": jnp.int32(0),
            "leaf_slot": jnp.int32(0),
            "path_nodes": path_nodes,
            "path_slots": path_slots,
        }
        out = jax.lax.while_loop(cond, body, init)
        return out

    # -------------------- one simulation wave --------------------

    def _take_node_state(self, tree_state: EnvState, node: jax.Array) -> EnvState:
        """Per-game node-state read as a one-hot matmul over the node dim.

        Batched dynamic gathers over [B, M, ...] buffers are the slowest op
        class on TPU; a [1, M] x [M, P] dot on the MXU reads the same data
        contiguously. All EnvState leaves hold small integers, exact in f32.
        """
        M = tree_state.terminated.shape[0]
        onehot = (jnp.arange(M) == node).astype(jnp.float32)[None, :]  # [1, M]

        def take(x):
            xf = x.astype(jnp.float32).reshape(M, -1)
            out = jnp.matmul(onehot, xf, preferred_element_type=jnp.float32)[0]
            return out.reshape(x.shape[1:]).astype(x.dtype)

        return jax.tree_util.tree_map(take, tree_state)

    def _gather_parent(self, tree: Tree, t):
        """Per-game: the traversal's leaf-edge parent state and action."""
        parent, slot = t["leaf_parent"], t["leaf_slot"]
        parent_state = self._take_node_state(tree.state, parent)
        K = self.config.max_children
        M = tree.expanded.shape[0]
        onehot_p = (jnp.arange(M) == parent).astype(jnp.float32)[None, :]
        row = jnp.matmul(
            onehot_p, tree.child_action.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )[0]  # [K]
        action = jnp.sum(row * (jnp.arange(K) == slot)).astype(jnp.int32)
        return parent_state, jnp.maximum(action, 0)

    def _materialize(self, tree: Tree, t, child_state: EnvState):
        """Per-game phase 1b: write the stepped child into the tree and
        return (updated tree, leaf node index).

        The leaf's legal mask comes for free from the materializing env step
        (``info.legal_mask`` — the env already runs the next player's ray
        scan for its NoPlays check), so the search never recomputes it. It is
        only meaningful for newly materialized leaves; the other leaf kinds
        (terminal nodes, depth-capped nodes) are never (re-)expanded.
        """
        at_node_leaf = t["at_node_leaf"]
        parent, slot = t["leaf_parent"], t["leaf_slot"]
        new_idx = tree.n_nodes
        make_new = ~at_node_leaf

        # All node-buffer writes use dense one-hot masked selects rather than
        # .at[] scatters: batched dynamic scatters over the node dim are the
        # slowest op class on TPU (see _simulate_post).
        M = tree.expanded.shape[0]
        K = self.config.max_children
        at_new = (jnp.arange(M) == new_idx) & make_new  # bool[M]

        def write_state(buf, val):
            def wr(b, v):
                m = at_new.reshape((M,) + (1,) * (b.ndim - 1))
                return jnp.where(m, v[None], b)

            return jax.tree_util.tree_map(wr, buf, val)

        at_parent_slot = (
            ((jnp.arange(M) == parent) & make_new)[:, None]
            & (jnp.arange(K) == slot)[None, :]
        )
        tree = tree.replace(
            state=write_state(tree.state, child_state),
            terminal=jnp.where(at_new, child_state.terminated, tree.terminal),
            terminal_value=jnp.where(
                at_new, terminal_value(child_state), tree.terminal_value
            ),
            child_node=jnp.where(at_parent_slot, new_idx, tree.child_node),
            n_nodes=tree.n_nodes + make_new.astype(jnp.int32),
        )
        leaf = jnp.where(at_node_leaf, t["node"], new_idx)
        return tree, leaf

    def _simulate_post(
        self, tree: Tree, t, leaf: jax.Array, priors: jax.Array, nn_value: jax.Array
    ) -> Tree:
        """Per-game phase 2: expand the leaf with NN priors (unless terminal)
        and back the value up the path."""
        leaf_terminal = tree.terminal[leaf]
        # Expand only newly materialized, non-terminal leaves (terminal nodes
        # are never expanded, mirroring the Es cache short-circuit at
        # src/mcts.py:77-81; depth-capped nodes are already expanded and keep
        # their edges — their NN value still backs up the path). Only the
        # three expansion fields are touched: a whole-tree select here would
        # copy every [M, K] buffer once per simulation.
        expand = ~t["at_node_leaf"] & ~leaf_terminal
        K = self.config.max_children
        top_p, top_a = self._topk(priors)
        has_mass = top_p > 0
        top_a = jnp.where(has_mass, top_a, -1).astype(jnp.int32)
        top_p = jnp.where(has_mass, top_p, 0.0)
        # One-hot masked writes to the three expansion fields: batched
        # dynamic gathers/scatters over the node dim are pathologically slow
        # on TPU, and a whole-tree select would copy every buffer, so a dense
        # masked where over just these [M, K] fields is the cheapest form.
        M = tree.expanded.shape[0]
        at_leaf = jnp.arange(M) == leaf  # bool[M]
        w = at_leaf & expand
        tree = tree.replace(
            expanded=tree.expanded | w,
            child_action=jnp.where(w[:, None], top_a[None, :], tree.child_action),
            child_prior=jnp.where(w[:, None], top_p[None, :], tree.child_prior),
        )

        v = jnp.where(leaf_terminal, tree.terminal_value[leaf], nn_value)

        # Negamax backup along the recorded path (src/mcts.py:125-136),
        # as one-hot path matmuls on the MXU: the sequential per-level
        # scatter loop (a vmapped fori_loop of .at[].add updates) measured
        # ~5 ms/wave at 1024 games — by far the slowest part of the search.
        # Path position j (0 = root edge) receives v * (-1)^(depth - j).
        depth = t["depth"]
        D = t["path_nodes"].shape[0]
        j = jnp.arange(D)
        on_path = j < depth  # bool[D]
        sign_v = jnp.where((depth - j) % 2 == 1, -v, v) * on_path  # f32[D]
        P = (
            (t["path_nodes"][:, None] == jnp.arange(M)[None, :]) & on_path[:, None]
        ).astype(jnp.float32)  # [D, M]
        S = (t["path_slots"][:, None] == jnp.arange(K)[None, :]).astype(
            jnp.float32
        )  # [D, K]
        w_add = jnp.matmul(P.T, S * sign_v[:, None], preferred_element_type=jnp.float32)
        n_add = jnp.matmul(
            P.T, S * on_path[:, None], preferred_element_type=jnp.float32
        )
        return tree.replace(
            child_W=tree.child_W + w_add,
            child_N=tree.child_N + n_add.astype(jnp.int32),
            node_N=tree.node_N + jnp.sum(P, axis=0).astype(jnp.int32),
        )

    # -------------------- public API --------------------

    def search(
        self,
        params,
        root_state: EnvState,
        root_legal: jax.Array,
        rng: jax.Array,
        add_noise: bool = True,
    ) -> SearchResult:
        """Run ``num_simulations`` sims for a batch of root states.

        All leading dims are batched: ``root_state`` leaves have shape
        ``[B, ...]``, ``root_legal`` is ``bool[B, A]``.
        """
        B = root_legal.shape[0]
        cfg = self.config

        # Root evaluation + expansion (the first leaf visit of the root).
        obs = jax.vmap(self.env.observe)(root_state)
        logits, _ = self.evaluate(params, obs)
        priors = _masked_priors(logits, root_legal)
        if add_noise and cfg.dirichlet_eps > 0:
            rng, sub = jax.random.split(rng)
            alpha = jnp.full((root_legal.shape[-1],), cfg.dirichlet_alpha)
            noise = jax.random.dirichlet(sub, alpha, shape=(B,)) * root_legal
            noise = noise / jnp.maximum(noise.sum(-1, keepdims=True), 1e-30)
            priors = (1 - cfg.dirichlet_eps) * priors + cfg.dirichlet_eps * noise
            priors = priors * root_legal

        tree = jax.vmap(self._empty_tree)(root_state)
        tree = jax.vmap(self._expand_node)(tree, jnp.zeros((B,), jnp.int32), priors)

        def sim_step(carry, _):
            tree = carry
            t = jax.vmap(self._traverse)(tree)
            parent_state, actions = jax.vmap(self._gather_parent)(tree, t)
            # Batched env step — the fused pallas kernel on TPU. Its
            # info.legal_mask is the leaf's mask for prior computation.
            child_state, step_info = self.env.step_many(parent_state, actions)
            leaf_legal = step_info.legal_mask
            tree, leaf = jax.vmap(self._materialize)(tree, t, child_state)
            leaf_state = jax.vmap(
                lambda tr, lf: self._take_node_state(tr.state, lf)
            )(tree, leaf)
            obs = jax.vmap(self.env.observe)(leaf_state)
            logits, value = self.evaluate(params, obs)
            priors = _masked_priors(logits, leaf_legal)
            tree = jax.vmap(self._simulate_post)(tree, t, leaf, priors, value)
            return tree, None

        tree, _ = jax.lax.scan(
            sim_step, tree, None, length=cfg.num_simulations
        )

        # Visit-count policy at the root (src/mcts.py:40-41).
        A = root_legal.shape[-1]
        root_counts = tree.child_N[:, 0, :].astype(jnp.float32)  # [B, K]
        root_actions = tree.child_action[:, 0, :]  # [B, K]
        valid = root_actions >= 0
        probs = jnp.zeros((B, A), jnp.float32)
        batch_idx = jnp.arange(B)[:, None]
        probs = probs.at[batch_idx, jnp.maximum(root_actions, 0)].add(
            jnp.where(valid, root_counts, 0.0)
        )
        total = jnp.maximum(probs.sum(-1, keepdims=True), 1e-30)
        probs = probs / total

        root_visits = tree.node_N[:, 0]
        root_W = jnp.sum(jnp.where(valid, tree.child_W[:, 0, :], 0.0), axis=-1)
        root_value = root_W / jnp.maximum(root_visits.astype(jnp.float32), 1.0)
        return SearchResult(
            action_probs=probs,
            root_value=root_value,
            root_visits=root_visits,
            tree=tree,
        )


def select_actions(
    probs: jax.Array, legal: jax.Array, temperature: jax.Array, rng: jax.Array
) -> jax.Array:
    """Sample actions from the visit-count policy with temperature.

    ``temp == 0``: argmax with uniform random tie-break (``mcts.py:43-48``);
    otherwise sample from ``counts ** (1/temp)`` renormalized
    (``mcts.py:50-53``).
    """
    B, A = probs.shape
    rng_tie, rng_sample = jax.random.split(rng)
    # Argmax with random tie-break.
    is_max = (probs >= jnp.max(probs, axis=-1, keepdims=True)) & legal
    tie_noise = jax.random.uniform(rng_tie, (B, A))
    greedy = jnp.argmax(is_max * (1.0 + tie_noise), axis=-1)
    # Temperature sampling.
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))
    t = jnp.maximum(temperature, 1e-6)[:, None]
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)) / t, NEG_INF)
    sampled = jax.random.categorical(rng_sample, logits, axis=-1)
    return jnp.where(temperature <= 0, greedy, sampled).astype(jnp.int32)
