"""Pallas TPU kernel for the batched legal-move ray scan.

The legal-action mask is the hottest op in the framework: it runs once per
env step (the next player's mask doubles as the NoPlays outcome check,
``/root/reference/game/game/logic.rs:760-768``) and its XLA lowering
materializes the ``[B, N, N, 4, N-1]`` ray tensor several times (pad+add
concatenates). This kernel fuses the whole scan into one VMEM-resident
program per 128-game block with a single HBM write of the output.

Layout: games ride the 128-wide lane dimension and board cells the sublane
dimension (``[N*N, 128]``), so every elementwise op processes 128 games at
once. Board shifts along a ray direction become static sublane slices of a
zero-padded cell axis: for flat cell index ``f = r*N + c``, the tile at
``(r+dr, c+dc)`` is ``f + dr*N + dc``; vertical moves stay in-bounds exactly
when the padded slice does, horizontal moves additionally need the static
per-offset column-validity mask (wrap-around rows are masked off).

Ray semantics reproduce ``ValidPlayIterator`` + ``validate_play_for_side``
(``game/play.rs:189-225``, ``game/game/logic.rs:159-214``) exactly as
``TaflEnv._class_ray_mask`` does; the two implementations are differentially
tested against each other (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Cell codes (duplicated from core.rules to keep this module import-light).
EMPTY, CELL_ATT, CELL_DEF, CELL_KING = 0, 1, 2, 3


def _shift_masks(n: int) -> np.ndarray:
    """``valid[dir, dist, cell]``: whether ``cell + offset(dir, dist)`` is the
    true board tile ``dist`` steps away in ``dir`` (no row wrap, in bounds)."""
    valid = np.zeros((4, n - 1, n * n), dtype=bool)
    rows, cols = np.divmod(np.arange(n * n), n)
    drdc = [(-1, 0), (1, 0), (0, -1), (0, 1)]  # up, down, left, right
    for d, (dr, dc) in enumerate(drdc):
        for k in range(1, n):
            r2, c2 = rows + dr * k, cols + dc * k
            valid[d, k - 1] = (r2 >= 0) & (r2 < n) & (c2 >= 0) & (c2 < n)
    return valid


def _build_kernel(n: int, num_classes: int, max_dists: Tuple[int, ...], class_selectors: Tuple):
    """Build the pallas kernel body for a fixed board size and rule config.

    Static boolean tables (shift-validity per (dir, dist), occupiable and
    passable per unique piece-class config) arrive as the ``consts_ref``
    input of shape ``[n*n, C]`` — pallas kernels cannot capture array
    constants. Column layout: ``d*(n-1)+(k-1)`` for shift validity, then
    ``V + 2i`` / ``V + 2i + 1`` for class ``i``'s occupiable/passable.

    ``class_selectors``: per unique config, the ``(cell_code, side)`` pairs
    whose pieces use that config.
    """
    nn = n * n
    ndist = n - 1
    V = 4 * ndist
    offs = [-n, n, -1, 1]

    def kernel(board_ref, side_ref, consts_ref, out_ref):
        # Everything stays strictly 2-D [sublanes, lanes] and all boolean
        # math runs in int32 0/1 arithmetic: Mosaic cannot shape-cast >2-D i1
        # vectors, concatenate i1, or compare packed i8 layouts. Output rows
        # are ordered (dir, dist, cell) so each (d, k) slice is one
        # contiguous [nn, LANES] store; the caller permutes back to action
        # order (cell, dir, dist).
        board = board_ref[:]  # int32[nn, LANES]
        side = side_ref[:]  # int32[1, LANES]
        consts = consts_ref[:]  # int32 0/1 [nn, C]
        empty = (board == EMPTY).astype(jnp.int32)

        # Which piece class stands on each cell, per game, per unique config.
        sel = []
        for pairs in class_selectors:
            s = jnp.zeros((nn, LANES), dtype=jnp.int32)
            for cell_code, side_val in pairs:
                s = s | (
                    (board == cell_code) & (side == side_val)
                ).astype(jnp.int32)
            sel.append(s)

        pad = jnp.zeros((n * ndist, LANES), dtype=jnp.int32)

        def shift(x_padded, d, k):
            off = offs[d] * k
            base = n * ndist
            sl = jax.lax.slice_in_dim(x_padded, base + off, base + off + nn, axis=0)
            return sl & consts[:, d * ndist + (k - 1)][:, None]

        dest_p, pass_p = [], []
        for i in range(num_classes):
            dest_ok = empty & consts[:, V + 2 * i][:, None]
            pass_ok = empty & consts[:, V + 2 * i + 1][:, None]
            dest_p.append(jnp.concatenate([pad, dest_ok, pad], axis=0))
            pass_p.append(jnp.concatenate([pad, pass_ok, pad], axis=0))

        zero = jnp.zeros((nn, LANES), dtype=jnp.int32)
        for d in range(4):
            cums = [jnp.ones((nn, LANES), dtype=jnp.int32)] * num_classes
            for k in range(1, n):
                v = zero
                for i in range(num_classes):
                    if k > max_dists[i]:
                        continue
                    v = v | (shift(dest_p[i], d, k) & cums[i] & sel[i])
                    cums[i] = cums[i] & shift(pass_p[i], d, k)
                row = (d * ndist + (k - 1)) * nn
                out_ref[pl.ds(row, nn), :] = v

    return kernel


@functools.lru_cache(maxsize=None)
def _make_batched_mask_fn(n: int, class_tables, class_selectors, interpret: bool):
    nn, ndist, A = n * n, n - 1, n * n * 4 * (n - 1)
    num_classes = len(class_tables)
    max_dists = tuple(md for _, _, md in class_tables)
    kernel = _build_kernel(n, num_classes, max_dists, class_selectors)

    # Packed static tables: [nn, 4*(n-1) + 2*num_classes].
    valid = _shift_masks(n)  # [4, n-1, nn]
    cols = [valid[d, k] for d in range(4) for k in range(ndist)]
    for occupiable, passable, _ in class_tables:
        cols.append(np.array(occupiable, dtype=bool))
        cols.append(np.array(passable, dtype=bool))
    consts = np.stack(cols, axis=1)  # [nn, C]
    C = consts.shape[1]

    def batched(boards: jax.Array, sides: jax.Array) -> jax.Array:
        """``boards`` int8[B, N, N], ``sides`` int32[B] -> bool[B, A]."""
        B = boards.shape[0]
        Bp = (B + LANES - 1) // LANES * LANES
        bt = boards.reshape(B, nn).T.astype(jnp.int32)  # [nn, B]
        bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))
        st = jnp.pad(sides.astype(jnp.int32), (0, Bp - B)).reshape(1, Bp)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // LANES,),
            in_specs=[
                pl.BlockSpec((nn, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nn, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (A, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((A, Bp), jnp.int32),
            interpret=interpret,
        )(bt, st, jnp.asarray(consts, dtype=jnp.int32))
        # Kernel rows are (dir, dist, cell); permute to the action encoding's
        # (cell, dir, dist) order.
        m = (out.T[:B] != 0).reshape(B, 4, ndist, nn)
        return m.transpose(0, 3, 1, 2).reshape(B, A)

    return batched


def batched_legal_mask(env, boards: jax.Array, sides: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Batched legal-action mask for ``env``'s ruleset via the pallas kernel.

    Exact drop-in for ``vmap(env.legal_mask_for_side)``. Unique piece-class
    configs are deduplicated (attacker/defender soldiers usually share one
    ray scan) and baked into the kernel as static tables.
    """
    n = env.n
    # Group the 3 piece classes by identical static config, like
    # TaflEnv.legal_mask_for_side does.
    cfg_to_idx = {}
    tables = []
    selectors = []
    piece_sides = (0, 1, 1)  # attacker soldier, defender soldier, king
    for cls in range(3):
        cfg = env.cls_cfg[cls]
        if cfg not in cfg_to_idx:
            cfg_to_idx[cfg] = len(tables)
            occupiable = tuple(env._occupiable[cls].reshape(-1).tolist())
            passable = tuple(
                (~(env.throne_mask & cfg.throne_pass_blocked)).reshape(-1).tolist()
            )
            max_dist = 1 if cfg.slow else n - 1
            tables.append((occupiable, passable, max_dist))
            selectors.append([])
        selectors[cfg_to_idx[cfg]].append((cls + 1, piece_sides[cls]))

    # Static args are hashable tuples so the built kernel is lru-cached.
    fn = _make_batched_mask_fn(
        n, tuple(tables), tuple(tuple(s) for s in selectors), interpret
    )
    return fn(boards, sides)
