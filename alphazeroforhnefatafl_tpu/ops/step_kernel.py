"""Fused pallas TPU kernel for the tafl env step's array phase.

One kernel program per 128-game block computes, entirely in VMEM: action
decode, piece move, custodian + shieldwall captures (``get_captures``,
``/root/reference/game/game/logic.rs:604-699``; ``detect_shieldwall``,
``logic.rs:471-569``), and the next player's full legal-move ray scan
(``logic.rs:159-214``). The XLA lowering of the same math is ~1k unfused
small ops per step whose per-op launch overhead dominates at tafl board
sizes; fusing them into one program removes that overhead entirely.

Layout and Mosaic constraints follow ops/legal_mask.py: games ride the
128-wide lane dimension, board cells the sublane dimension (``[N*N, 128]``),
all boolean math is int32 0/1 arithmetic, everything stays 2-D, and board
shifts are static sublane slices of a zero-padded cell axis gated by static
validity columns.

The shieldwall lane walk (sequential in the reference) is computed with
segmented Hillis-Steele doubling: ``run`` = the maximal chain of
pinned-enemy "extender" tiles adjacent to the destination along the edge,
found in log2(N) shift-AND steps; the first non-extender tile then decides
close/fail exactly as the reference's walk does (see
``TaflEnv._shieldwall_captures``).

Flood-fill outcomes (enclosure/surround win and exit fort,
``logic.rs:309-401, 572-601``) are computed IN the kernel too, as bounded
segmented-propagation fixpoints over the cell axis — and so are the
repetition tracker (4-slot ring + mid-pair toggles, ``state.rs:92-113``)
and the outcome priority select (``logic.rs:702-771``), as [1, LANES] lane
math. Outside the kernel only ``TaflEnv._epilogue`` remains (the
invalid/terminal freeze and StepInfo packing, ~a dozen small wheres). The
per-game JAX path computes the identical quantities in XLA and feeds the
same ``_epilogue``; the two paths are differentially tested field-for-field
against each other.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

EMPTY, CELL_ATT, CELL_DEF, CELL_KING = 0, 1, 2, 3

# Direction order everywhere: up, down, left, right (matches core.actions).
DRDC = ((-1, 0), (1, 0), (0, -1), (0, 1))
OPP = (1, 0, 3, 2)
PERPS = ((2, 3), (2, 3), (0, 1), (0, 1))


def _static_tables(env) -> Tuple[np.ndarray, dict]:
    """Pack every static per-cell table into one ``[nn, C]`` int32 array and
    collect the static python scalars the kernel closes over."""
    from ..core.rules import KingAttack, KingStrength

    n = env.n
    nn = n * n
    rows, cols = np.divmod(np.arange(nn), n)

    cols_list = []
    index = {}

    def add(name, arr):
        index[name] = len(cols_list)
        cols_list.append(np.asarray(arr, dtype=bool).reshape(nn))

    # Shift validity per (dir, dist): cell + off stays on board, no row wrap.
    # One source of truth with the legal-mask kernel (same DRDC order there).
    from .legal_mask import _shift_masks

    valid = _shift_masks(n)  # [4, n-1, nn]
    for d in range(4):
        for k in range(1, n):
            add(f"valid_{d}_{k}", valid[d, k - 1])

    # Move-class tables (deduplicated like TaflEnv.legal_mask_for_side).
    move_cfg_idx = {}
    move_tables = []
    move_selectors = []
    piece_sides = (0, 1, 1)
    for cls in range(3):
        cfg = env.cls_cfg[cls]
        if cfg not in move_cfg_idx:
            i = len(move_tables)
            move_cfg_idx[cfg] = i
            add(f"occupiable_{i}", env._occupiable[cls])
            add(
                f"passable_{i}",
                ~(env.throne_mask & cfg.throne_pass_blocked),
            )
            move_tables.append(1 if cfg.slow else n - 1)  # max_dist
            move_selectors.append([])
        move_selectors[move_cfg_idx[cfg]].append((cls + 1, piece_sides[cls]))

    # Hostility / geometry tables.
    for c in range(3):
        add(f"special_hostile_{c}", env._special_hostile[c])
        add(f"cls_occ_{c}", env._occupiable[c])
    add("corner", env.corner_mask)
    add("edge", env.edge_mask)
    add("row0", rows == 0)
    add("rowN", rows == n - 1)
    add("col0", cols == 0)
    add("colN", cols == n - 1)
    thr_r, thr_c = env.throne
    thr_flat = thr_r * n + thr_c
    add("beside_throne", np.abs(rows - thr_r) + np.abs(cols - thr_c) == 1)
    # is_throne(cell + delta) per direction, and cell == throne - delta.
    for d, (dr, dc) in enumerate(DRDC):
        add(f"throne_at_{d}", (rows + dr == thr_r) & (cols + dc == thr_c))
    sw = env.rules.shieldwall
    cc = env.corner_mask.reshape(nn) & (bool(sw.corners_may_close) if sw else False)
    add("cc", cc)

    consts = np.stack(cols_list, axis=1).astype(np.int32)

    rules = env.rules
    from ..core.rules import PIECE_CLASSES

    static = dict(
        n=n,
        thr_flat=thr_flat,
        king_attacks=rules.king_attack in (KingAttack.ARMED, KingAttack.HAMMER),
        king_hostile_when_enemy=rules.king_attack
        in (KingAttack.ARMED, KingAttack.ANVIL),
        king_strength=rules.king_strength,
        special_rules_on=(
            rules.king_strength == KingStrength.STRONG_BY_THRONE
            and rules.throne_movement.name in ("NO_ENTRY", "KING_ENTRY")
        ),
        linnaean=bool(rules.linnaean_capture),
        enclosure_win=rules.enclosure_win,
        exit_fort=bool(rules.exit_fort),
        sw_on=sw is not None,
        sw_caps=tuple(sw.captures.contains(p) for p in PIECE_CLASSES)
        if sw
        else (False, False, False),
        edge_hostile=tuple(cfg.hostile_edge for cfg in env.cls_cfg),
        move_max_dists=tuple(move_tables),
        move_selectors=tuple(tuple(s) for s in move_selectors),
        edge_escape=bool(rules.edge_escape),
        rep_rule=(
            (int(rules.repetition_rule.n_repetitions), bool(rules.repetition_rule.is_loss))
            if rules.repetition_rule is not None
            else None
        ),
        draw_on_no_plays=bool(rules.draw_on_no_plays),
        index=index,
    )
    return consts, static


def _build_step_kernel(static: dict):
    n = static["n"]
    nn = n * n
    ndist = n - 1
    idx = static["index"]
    offs = [-n, n, -1, 1]
    from ..core.rules import KingStrength

    def kernel(board_ref, side_ref, action_ref, rep_ref, consts_ref,
               board3_ref, cap_ref, mask_ref, scal_ref):
        board = board_ref[:]  # int32[nn, LANES]
        side = side_ref[:]  # int32[1, LANES]
        action = action_ref[:]  # int32[1, LANES]
        rep = rep_ref[:]  # int32[10, LANES]: ring0-3, first_i, reps a/d, mid a/d, psc
        consts = consts_ref[:]  # int32[nn, C]

        def col(name):
            return consts[:, idx[name]][:, None]  # [nn, 1]

        one = jnp.ones((nn, LANES), jnp.int32)
        zero = jnp.zeros((nn, LANES), jnp.int32)
        padz = jnp.zeros((n * ndist, LANES), jnp.int32)

        def shift(x, d, k):
            """Value of x at cell + offs[d]*k; 0 when off-board/row-wrapped."""
            xp = jnp.concatenate([padz, x, padz], axis=0)
            base = n * ndist
            off = offs[d] * k
            sl = jax.lax.slice_in_dim(xp, base + off, base + off + nn, axis=0)
            return sl & col(f"valid_{d}_{k}")

        iota = jax.lax.broadcasted_iota(jnp.int32, (nn, LANES), 0)

        # ---- action decode (core.actions encoding) ----
        per_tile = 4 * ndist
        from_flat = action // per_tile
        rem = action % per_tile
        d_lane = rem // ndist
        dist = rem % ndist + 1
        fr, fc = from_flat // n, from_flat % n
        dr = jnp.where(d_lane == 0, -1, jnp.where(d_lane == 1, 1, 0))
        dc = jnp.where(d_lane == 2, -1, jnp.where(d_lane == 3, 1, 0))
        tr, tc = fr + dr * dist, fc + dc * dist
        to_in_b = ((tr >= 0) & (tr < n) & (tc >= 0) & (tc < n)).astype(jnp.int32)
        trc = jnp.clip(tr, 0, n - 1)
        tcc = jnp.clip(tc, 0, n - 1)
        to_flat = trc * n + tcc

        onehot_from = (iota == from_flat).astype(jnp.int32)
        onehot_to = (iota == to_flat).astype(jnp.int32)
        moving = jnp.sum(board * onehot_from, axis=0, keepdims=True)  # [1, LANES]
        moving_side = jnp.where(moving == CELL_ATT, 0, 1)
        valid_basic = to_in_b & (moving != EMPTY) & (moving_side == side)

        # ---- move the piece ----
        board2 = board * (1 - onehot_from)
        board2 = board2 * (1 - onehot_to) + moving * onehot_to

        # ---- king position on board2 ----
        king1h = (board2 == CELL_KING).astype(jnp.int32)
        kflat = jnp.sum(iota * king1h, axis=0, keepdims=True)  # [1, LANES]

        # ---- hostility fields (logic.rs:76-99) ----
        empty2 = (board2 == EMPTY).astype(jnp.int32)
        is_att2 = (board2 == CELL_ATT).astype(jnp.int32)
        is_def2 = (board2 == CELL_DEF).astype(jnp.int32)
        is_king2 = king1h
        att_enemy = is_def2 | (is_king2 if static["king_hostile_when_enemy"] else zero)
        def_enemy = is_att2
        hostile = [
            att_enemy | (empty2 & col("special_hostile_0")),
            def_enemy | (empty2 & col("special_hostile_1")),
            def_enemy | (empty2 & col("special_hostile_2")),
        ]

        # ---- king strength (logic.rs:225-245) ----
        king_on_throne = (kflat == static["thr_flat"]).astype(jnp.int32)
        king_beside = jnp.sum(
            (iota == kflat).astype(jnp.int32) * col("beside_throne"),
            axis=0,
            keepdims=True,
        )
        ks = static["king_strength"]
        if ks == KingStrength.STRONG:
            king_strong = jnp.ones((1, LANES), jnp.int32)
        elif ks == KingStrength.WEAK:
            king_strong = jnp.zeros((1, LANES), jnp.int32)
        else:
            king_strong = king_on_throne | king_beside

        may_attack = (moving != CELL_KING).astype(jnp.int32) | int(
            static["king_attacks"]
        )

        # ---- Linnaean precondition (logic.rs:859-879) ----
        if static["linnaean"]:
            thr1h = (iota == static["thr_flat"]).astype(jnp.int32)
            thr_nbr = zero
            for d2 in range(4):
                thr_nbr = thr_nbr | shift(thr1h, OPP[d2], 1)
            linn_cnt = jnp.sum(hostile[2] * thr_nbr, axis=0, keepdims=True)
            linn_ok = (
                (side == 0).astype(jnp.int32) & king_on_throne & (linn_cnt == 3)
            )
        else:
            linn_ok = jnp.zeros((1, LANES), jnp.int32)

        eh = static["edge_hostile"]

        def hostile_at(cls_i, d, k):
            """hostile[cls] at cell + offs[d]*k; off-board = edge hostility."""
            v = shift(hostile[cls_i], d, k)
            if eh[cls_i]:
                v = v | (1 - col(f"valid_{d}_{k}"))
            return v

        # ---- custodian captures (logic.rs:604-699) ----
        cap = zero
        q_is_def = (is_def2 | is_king2)
        enemy_f = jnp.where(side == 0, q_is_def, is_att2)
        for dgt in range(4):
            nbr = shift(onehot_to, OPP[dgt], 1)  # cells == to + delta
            far_att = hostile_at(0, dgt, 1)
            far_def = hostile_at(1, dgt, 1)
            far_king = hostile_at(2, dgt, 1)
            far_h = is_att2 * far_att + is_def2 * far_def + is_king2 * far_king
            p1 = hostile_at(2, PERPS[dgt][0], 1)
            p2 = hostile_at(2, PERPS[dgt][1], 1)
            perp_h = p1 & p2
            king_cust = far_king & ((1 - king_strong) | perp_h)
            if static["special_rules_on"]:
                all_nbr = one
                for d2 in range(4):
                    oob = 1 - col(f"valid_{d2}_1")
                    all_nbr = all_nbr & (
                        oob | col(f"throne_at_{d2}") | shift(hostile[2], d2, 1)
                    )
                king_special = col("beside_throne") & all_nbr
            else:
                king_special = zero
            king_capt = king_special | king_cust
            if static["linnaean"]:
                linn_here = linn_ok & col(f"throne_at_{dgt}") & is_def2
            else:
                linn_here = zero
            soldier_capt = far_h | linn_here
            captured = (
                enemy_f
                & nbr
                & may_attack
                & jnp.where(is_king2 != 0, king_capt, soldier_capt)
            )
            cap = cap | captured

        # ---- shieldwall (logic.rs:471-569) ----
        if static["sw_on"]:
            occ = 1 - empty2
            cell_side = jnp.where(board2 == CELL_ATT, 0, 1)
            friendly = occ & (cell_side == side).astype(jnp.int32)
            enemy2 = occ & (cell_side != side).astype(jnp.int32)
            cc = col("cc")

            def lane_fields(pin_dir):
                pin = shift(board2, pin_dir, 1)
                pin_occ = (pin != EMPTY).astype(jnp.int32)
                pin_side = jnp.where(pin == CELL_ATT, 0, 1)
                return enemy2 & pin_occ & (pin_side == side).astype(jnp.int32)

            # Pinned-enemy fields per edge lane (pin points off-edge).
            ep_h = (col("row0") & lane_fields(1)) | (col("rowN") & lane_fields(0))
            ep_v = (col("col0") & lane_fields(3)) | (col("colN") & lane_fields(2))
            row_lane = col("row0") | col("rowN")
            col_lane = col("col0") | col("colN")

            capA, capD, capK = static["sw_caps"]
            cls_ok = (
                (is_att2 if capA else zero)
                | (is_def2 if capD else zero)
                | (is_king2 if capK else zero)
            )

            to_row_lane = jnp.sum(onehot_to * row_lane, axis=0, keepdims=True)
            to_col_lane = jnp.sum(onehot_to * col_lane, axis=0, keepdims=True)
            v_on = to_col_lane & (1 - to_row_lane)  # case priority: rows first

            def sw_scan(ep, lane, neg_dir, pos_dir, seed_gate):
                """Both-direction wall scan along one lane family."""
                ext = ep & (1 - cc) & lane
                closer = (friendly | ((1 - occ) & cc) | (ep & cc)) & lane
                to_lane = onehot_to * lane * seed_gate

                def one_dir(d_walk):
                    # d_walk: direction index whose offset walks the lane.
                    seed = shift(to_lane, OPP[d_walk], 1) & ext
                    r, W = seed, ext
                    s = 1
                    while s <= ndist:
                        r = r | (shift(r, OPP[d_walk], s) & W)
                        W = W & shift(W, OPP[d_walk], s)
                        s *= 2
                    q = shift(r | to_lane, OPP[d_walk], 1) & (1 - ext) & lane
                    close = jnp.sum(q & closer, axis=0, keepdims=True)
                    incl = jnp.sum(q & ep & cc, axis=0, keepdims=True)
                    cnt = jnp.sum(r, axis=0, keepdims=True) + incl
                    succ = (close > 0).astype(jnp.int32) & (cnt >= 2).astype(
                        jnp.int32
                    )
                    wall = r | (q & ep & cc)
                    return succ, wall

                s_neg, w_neg = one_dir(neg_dir)
                s_pos, w_pos = one_dir(pos_dir)
                succ = s_neg | s_pos
                wall = jnp.where(s_neg != 0, w_neg, w_pos)
                return wall & cls_ok & succ

            sw_mask = sw_scan(ep_h, row_lane, 2, 3, one[:1] * 0 + 1) | sw_scan(
                ep_v, col_lane, 0, 1, v_on
            )
            cap = cap | sw_mask

        board3 = board2 * (1 - cap)

        # ---- flood-fill outcomes on board3 (logic.rs:309-463, 572-601) ----
        empty3 = (board3 == EMPTY).astype(jnp.int32)
        is_att3 = (board3 == CELL_ATT).astype(jnp.int32)
        is_def3 = (board3 == CELL_DEF).astype(jnp.int32)
        is_king3 = (board3 == CELL_KING).astype(jnp.int32)
        att_enemy3 = is_def3 | (
            is_king3 if static["king_hostile_when_enemy"] else zero
        )
        def_enemy3 = is_att3
        hostile3 = [
            att_enemy3 | (empty3 & col("special_hostile_0")),
            def_enemy3 | (empty3 & col("special_hostile_1")),
            def_enemy3 | (empty3 & col("special_hostile_2")),
        ]
        king1h2 = (iota == kflat).astype(jnp.int32)  # board2 king position

        def dil4(x):
            return x | shift(x, 0, 1) | shift(x, 1, 1) | shift(x, 2, 1) | shift(x, 3, 1)

        def spread_dir(r, a, d):
            """Segmented reach propagation along direction d (doubling)."""
            W = a
            s = 1
            while s <= ndist:
                r = r | (shift(r, d, s) & W)
                W = W & shift(W, d, s)
                s *= 2
            return r

        def flood(seed, allowed, fail_of):
            """Connected component with freeze-on-fail (TaflEnv._flood)."""
            seed = seed & allowed

            def cond(c):
                return c[1]

            def body(c):
                reach, _ = c
                failed = fail_of(reach)  # [1, LANES]
                a = allowed * (1 - failed) + reach * failed
                new = reach
                for d in range(4):
                    new = spread_dir(new, a, d)
                changed = jnp.any(new != reach)
                return new, changed

            reach, _ = jax.lax.while_loop(
                cond, body, (seed, jnp.asarray(True))
            )
            return reach

        def any_cells(x):
            return (jnp.sum(x, axis=0, keepdims=True) > 0).astype(jnp.int32)

        def secure(boundary, region, b_cls, hs_cls, inside_safe, outside_safe):
            """TaflEnv._enclosure_secure as cell fields (logic.rs:408-463)."""
            if inside_safe and outside_safe:
                return jnp.ones((1, LANES), jnp.int32)
            special_h = col(f"special_hostile_{b_cls}") & one
            tile_h = hostile3[b_cls]
            occupied3 = 1 - empty3
            occupiable_hs = col(f"cls_occ_{hs_cls}") & one
            axis_safe = []
            for axis_dirs in ((0, 1), (2, 3)):
                dir_safe = zero
                for d in axis_dirs:
                    in_b = col(f"valid_{d}_1") & one
                    n_inside = shift(region, d, 1)
                    n_special = shift(special_h, d, 1)
                    n_tile_h = shift(tile_h, d, 1)
                    n_occ = shift(occupied3, d, 1)
                    n_occupiable = shift(occupiable_hs, d, 1)
                    known = (n_inside if inside_safe else zero) | (
                        (1 - n_inside) if outside_safe else zero
                    )
                    safe_a = known & (1 - n_special)
                    safe_b = (1 - n_tile_h) & (n_occ | (1 - n_occupiable))
                    oob_safe = (1 - in_b) * (
                        0 if static["edge_hostile"][b_cls] else 1
                    )
                    dir_safe = dir_safe | (in_b & (safe_a | safe_b)) | oob_safe
                axis_safe.append(dir_safe)
            secure_cell = axis_safe[0] & axis_safe[1]
            return 1 - any_cells(boundary & (1 - secure_cell))

        if static["enclosure_win"] is not None:
            # Attacker surround win (logic.rs:720-734).
            live_a = (side == 0).astype(jnp.int32)
            defenders3 = is_def3 | is_king3
            allowed_s = empty3 | defenders3
            fail_mask = col("corner") & one
            if static["enclosure_win"].name == "WITHOUT_EDGE_ACCESS":
                fail_mask = fail_mask | col("edge")
            reach_s = flood(
                king1h2 * live_a,
                allowed_s,
                lambda r: any_cells(r & fail_mask),
            )
            fail_s = any_cells(reach_s & col("corner"))
            if static["enclosure_win"].name == "WITHOUT_EDGE_ACCESS":
                fail_s = fail_s | any_cells(reach_s & col("edge"))
            boundary_s = dil4(reach_s) & (1 - reach_s) & is_att3
            all_def_in = (
                jnp.sum(reach_s & defenders3, axis=0, keepdims=True)
                == jnp.sum(defenders3, axis=0, keepdims=True)
            ).astype(jnp.int32)
            sec_s = secure(boundary_s, reach_s, 0, 1, False, True)
            o_enclosed = (1 - fail_s) & all_def_in & sec_s
        else:
            o_enclosed = jnp.zeros((1, LANES), jnp.int32)

        if static["exit_fort"]:
            # Defender exit fort (logic.rs:572-601).
            live_d = (side == 1).astype(jnp.int32)
            king_at_edge = jnp.sum(king1h2 * col("edge"), axis=0, keepdims=True)
            allowed_f = empty3 | king1h2
            attackers3 = is_att3
            reach_f = flood(
                king1h2 * live_d * king_at_edge,
                allowed_f,
                lambda r: any_cells(dil4(r) & attackers3)
                | any_cells(r & col("corner")),
            )
            dil_f = dil4(reach_f)
            fail_neither = any_cells(dil_f & attackers3)
            fail_corner = any_cells(reach_f & col("corner"))
            boundary_f = dil_f & (1 - reach_f) & is_def3
            king_free = zero[:1]
            for d in range(4):
                king_free = king_free | jnp.sum(
                    king1h2 & shift(empty3, d, 1), axis=0, keepdims=True
                )
            king_free = (king_free > 0).astype(jnp.int32)
            sec_f = secure(boundary_f, reach_f, 1, 0, True, False)
            o_exit_fort = (
                king_at_edge
                & (1 - fail_neither)
                & (1 - fail_corner)
                & king_free
                & sec_f
            )
        else:
            o_exit_fort = jnp.zeros((1, LANES), jnp.int32)

        # ---- next player's legal mask on board3 (ops/legal_mask.py) ----
        side2 = 1 - side
        sel = []
        for pairs in static["move_selectors"]:
            s = zero
            for cell_code, side_val in pairs:
                s = s | (
                    (board3 == cell_code) & (side2 == side_val)
                ).astype(jnp.int32)
            sel.append(s)
        dest_ps, pass_ps = [], []
        for i in range(len(static["move_max_dists"])):
            dest_ps.append(empty3 & col(f"occupiable_{i}"))
            pass_ps.append(empty3 & col(f"passable_{i}"))
        has_play = jnp.zeros((1, LANES), jnp.int32)
        for d in range(4):
            cums = [one] * len(sel)
            for k in range(1, n):
                v = zero
                for i in range(len(sel)):
                    if k > static["move_max_dists"][i]:
                        continue
                    v = v | (shift(dest_ps[i], d, k) & cums[i] & sel[i])
                    cums[i] = cums[i] & shift(pass_ps[i], d, k)
                mask_ref[pl.ds((d * ndist + (k - 1)) * nn, nn), :] = v
                has_play = has_play | any_cells(v)

        board3_ref[:] = board3
        cap_ref[:] = cap

        # ---- per-game scalars ----
        to_at_edge = jnp.sum(onehot_to * col("edge"), axis=0, keepdims=True)
        to_at_corner = jnp.sum(onehot_to * col("corner"), axis=0, keepdims=True)
        king_captured = jnp.sum(cap * king1h, axis=0, keepdims=True)

        # ---- repetition tracking (state.rs:92-113; TaflEnv._finish_step) ----
        ring = [rep[i : i + 1] for i in range(4)]
        first_i = rep[4:5]
        reps_att, reps_def = rep[5:6], rep[6:7]
        mid_att, mid_def = rep[7:8], rep[8:9]
        psc = rep[9:10]

        capt_any = any_cells(cap)
        n_caps = jnp.sum(cap, axis=0, keepdims=True)
        rec = side + 2 * capt_any + 4 * action
        oldest = jnp.zeros((1, LANES), jnp.int32)
        for i in range(4):
            oldest = oldest + (first_i == i).astype(jnp.int32) * ring[i]
        match = (1 - capt_any) & (oldest == rec).astype(jnp.int32)
        side_att = (side == 0).astype(jnp.int32)
        mid = side_att * mid_att + (1 - side_att) * mid_def
        cur = side_att * reps_att + (1 - side_att) * reps_def
        incr = match & (1 - mid)
        new_rep_side = match * (cur + incr)
        n_reps_att = side_att * new_rep_side + (1 - side_att) * reps_att
        n_reps_def = (1 - side_att) * new_rep_side + side_att * reps_def
        new_mid_side = match & (1 - mid)
        n_mid_att = side_att * new_mid_side + (1 - side_att) * mid_att
        n_mid_def = (1 - side_att) * new_mid_side + side_att * mid_def
        ring_out = [
            jnp.where(first_i == i, rec, ring[i]).astype(jnp.int32)
            for i in range(4)
        ]
        n_first_i = (first_i + 1) % 4
        n_psc = psc + (1 - capt_any)

        # ---- outcome priority select (logic.rs:702-771) ----
        n_att_cnt = jnp.sum(is_att3, axis=0, keepdims=True)
        n_def_cnt = jnp.sum(is_def3 | is_king3, axis=0, keepdims=True)
        other_count = jnp.where(side == 0, n_def_cnt, n_att_cnt)
        o_all_captured = (other_count == 0).astype(jnp.int32)
        o_king_capt = side_att & king_captured
        escape_tile = to_at_edge if static["edge_escape"] else to_at_corner
        o_king_esc = (
            (1 - side_att)
            & (moving == CELL_KING).astype(jnp.int32)
            & (escape_tile > 0).astype(jnp.int32)
        )
        o_enc_g = side_att & o_enclosed
        o_fort_g = (1 - side_att) & o_exit_fort
        if static["rep_rule"] is not None:
            rep_n_req, rep_is_loss = static["rep_rule"]
            o_rep = (new_rep_side >= rep_n_req).astype(jnp.int32)
        else:
            o_rep = jnp.zeros((1, LANES), jnp.int32)
            rep_is_loss = False
        o_no_plays = 1 - has_play

        # Result codes -1/0/1/2 and reason codes mirror core.env (ONGOING /
        # WIN_ATTACKER / WIN_DEFENDER / DRAW; WinReason + R_DRAW_* = 16/17).
        win_side, other = side, 1 - side
        lane1 = jnp.ones((1, LANES), jnp.int32)
        candidates = [
            (o_all_captured, win_side, lane1 * 3),  # ALL_CAPTURED
            (o_king_capt, lane1 * 0, lane1 * 2),  # KING_CAPTURED
            (o_enc_g, lane1 * 0, lane1 * 4),  # ENCLOSED
            (o_king_esc, lane1 * 1, lane1 * 0),  # KING_ESCAPED
            (o_fort_g, lane1 * 1, lane1 * 1),  # EXIT_FORT
            (
                o_rep,
                other if rep_is_loss else lane1 * 2,
                lane1 * (6 if rep_is_loss else 16),
            ),
            (
                o_no_plays,
                lane1 * 2 if static["draw_on_no_plays"] else win_side,
                lane1 * (17 if static["draw_on_no_plays"] else 5),
            ),
        ]
        result = lane1 * -1
        reason = lane1 * -1
        done = jnp.zeros((1, LANES), jnp.int32)
        for cond_i, res_i, reason_i in candidates:
            take = cond_i & (1 - done)
            result = jnp.where(take != 0, res_i, result)
            reason = jnp.where(take != 0, reason_i, reason)
            done = done | cond_i

        scal = jnp.concatenate(
            [
                valid_basic,
                moving,
                trc,
                tcc,
                kflat,
                king_captured,
                to_at_edge,
                to_at_corner,
                o_enclosed,
                o_exit_fort,
                result,
                reason,
                done,
                n_first_i,
                n_reps_att,
                n_reps_def,
                n_mid_att,
                n_mid_def,
                n_psc,
                ring_out[0],
                ring_out[1],
                ring_out[2],
                ring_out[3],
                n_caps,
            ],
            axis=0,
        )
        scal_ref[:] = scal

    return kernel


@functools.lru_cache(maxsize=None)
def _make_step_fn(env, interpret: bool):
    n = env.n
    nn, ndist, A = n * n, n - 1, n * n * 4 * (n - 1)
    consts_np, static = _static_tables(env)
    kernel = _build_step_kernel(static)
    C = consts_np.shape[1]

    def batched(boards, sides, actions, recent_plays, rep_first_i, reps,
                mid_pair, plays_since_capture):
        B = boards.shape[0]
        Bp = (B + LANES - 1) // LANES * LANES
        bt = jnp.pad(boards.reshape(B, nn).T.astype(jnp.int32), ((0, 0), (0, Bp - B)))
        st = jnp.pad(sides.astype(jnp.int32), (0, Bp - B)).reshape(1, Bp)
        at = jnp.pad(actions.astype(jnp.int32), (0, Bp - B)).reshape(1, Bp)
        # Repetition-tracker rows: ring0-3, first_i, reps a/d, mid a/d, psc.
        rep_rows = jnp.concatenate(
            [
                recent_plays.T.astype(jnp.int32),  # [4, B]
                rep_first_i.astype(jnp.int32)[None, :],
                reps.T.astype(jnp.int32),  # [2, B]
                mid_pair.T.astype(jnp.int32),  # [2, B]
                plays_since_capture.astype(jnp.int32)[None, :],
            ],
            axis=0,
        )
        rt = jnp.pad(rep_rows, ((0, 0), (0, Bp - B)))
        board3, cap, mask, scal = pl.pallas_call(
            kernel,
            grid=(Bp // LANES,),
            in_specs=[
                pl.BlockSpec((nn, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((10, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nn, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nn, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nn, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((A, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((24, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nn, Bp), jnp.int32),
                jax.ShapeDtypeStruct((nn, Bp), jnp.int32),
                jax.ShapeDtypeStruct((A, Bp), jnp.int32),
                jax.ShapeDtypeStruct((24, Bp), jnp.int32),
            ],
            interpret=interpret,
        )(bt, st, at, rt, jnp.asarray(consts_np))
        board3 = board3.T[:B].reshape(B, n, n).astype(jnp.int8)
        cap = (cap.T[:B] != 0).reshape(B, n, n)
        mask = (mask.T[:B] != 0).reshape(B, 4, ndist, nn)
        next_mask = mask.transpose(0, 3, 1, 2).reshape(B, A)
        scal = scal.T[:B]
        kflat = scal[:, 4]
        fin = dict(
            result=scal[:, 10],
            reason=scal[:, 11],
            terminated=scal[:, 12] != 0,
            rep_first_i=scal[:, 13],
            reps=scal[:, 14:16],
            mid_pair=scal[:, 16:18] != 0,
            plays_since_capture=scal[:, 18],
            recent_plays=scal[:, 19:23],
            n_captures=scal[:, 23],
        )
        return dict(
            valid=scal[:, 0] != 0,
            moving_cell=scal[:, 1].astype(jnp.int8),
            trc=scal[:, 2],
            tcc=scal[:, 3],
            king_r=kflat // n,
            king_c=kflat % n,
            king_captured=scal[:, 5] != 0,
            board3=board3,
            cap=cap,
            next_mask=next_mask,
            o_enclosed=scal[:, 8] != 0,
            o_exit_fort=scal[:, 9] != 0,
            fin=fin,
        )

    return batched


def step_arrays(
    env,
    boards,
    sides,
    actions,
    recent_plays,
    rep_first_i,
    reps,
    mid_pair,
    plays_since_capture,
    *,
    interpret: bool = False,
) -> Dict:
    """Fused array phase + finisher of a batch of env steps.

    Returns the same dict as ``vmap(TaflEnv._apply_play)`` plus the next
    player's legal mask AND the fused finisher outputs (``fin``: repetition
    tracker update, outcome priority select) — ``TaflEnv._finish_step``
    consumes them directly, leaving only the freeze/info epilogue outside
    the kernel. ``valid`` does NOT include the caller's terminated /
    validate checks; the freeze discards every fused-finisher output for
    invalid or already-terminated games.
    """
    return _make_step_fn(env, interpret)(
        boards, sides, actions, recent_plays, rep_first_i, reps, mid_pair,
        plays_since_capture,
    )
