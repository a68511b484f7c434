"""Checkpoint / resume for the AlphaZero loop.

The reference has no training checkpointing (SURVEY.md §5); its closest
analogues are FEN snapshots and in-memory undo history. Here a checkpoint
captures the full loop state — params, optimizer state, replay buffer
contents, PRNG key and iteration counter — via Orbax, so any host restart
resumes at the last iteration boundary.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .learner import TrainState
from .replay import ReplayBuffer


def _replay_state(replay: ReplayBuffer) -> Dict[str, Any]:
    return {
        "board": replay.board,
        "side": replay.side,
        "reps": replay.reps,
        "policy_idx": replay.policy_idx,
        "policy_p": replay.policy_p,
        "value": replay.value,
        "write": np.asarray(replay.write, np.int64),
        "size": np.asarray(replay.size, np.int64),
        "total_added": np.asarray(replay.total_added, np.int64),
    }


def _restore_replay(replay: ReplayBuffer, st: Dict[str, Any]) -> None:
    replay.board[...] = st["board"]
    replay.side[...] = st["side"]
    replay.reps[...] = st["reps"]
    replay.policy_idx[...] = st["policy_idx"]
    replay.policy_p[...] = st["policy_p"]
    replay.value[...] = st["value"]
    replay.write = int(st["write"])
    replay.size = int(st["size"])
    replay.total_added = int(st["total_added"])


def _leaf_path_shapes(tree) -> Dict[str, Any]:
    """Map normalized leaf path -> shape. Normalizing the key types (attr /
    dict / sequence) lets a live pytree (TrainState dataclass, optax tuples)
    be compared against orbax's on-disk metadata tree (nested dicts/lists),
    whose flattened paths spell the same structure with different key
    classes."""
    out: Dict[str, Any] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for k in path:
            if hasattr(k, "name"):
                parts.append(str(k.name))
            elif hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:  # pragma: no cover - future key types
                parts.append(str(k))
        out["/".join(parts)] = tuple(getattr(leaf, "shape", ()) or ())
    return out


class CheckpointManager:
    """Iteration-boundary checkpointing with retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        # item_handlers lets a FRESH manager read on-disk structure metadata
        # (saved_extra_keys) before any save/restore has typed the handler.
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def _replay_sidecar(self, iteration: int) -> str:
        """Per-host replay file for multi-host runs. Replay buffers are
        HOST-LOCAL (each process keeps its own games), so saving one into
        the single global orbax payload would hand every host process-0's
        buffer on restore — duplicated data, host 1+'s games silently
        dropped. Sidecars live under a non-numeric subdir so the orbax
        step scan ignores them; retention is pruned in :meth:`save`."""
        d = os.path.join(self.directory, f"replay_host{jax.process_index()}")
        return os.path.join(d, f"{iteration}.npz")

    def save(
        self,
        iteration: int,
        train_state: TrainState,
        replay: Optional[ReplayBuffer],
        rng: jax.Array,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        payload = {
            "train_state": train_state,
            "rng": np.asarray(rng),
            "extra": extra or {},
        }
        multi_host = jax.process_count() > 1
        if replay is not None and not multi_host:
            payload["replay"] = _replay_state(replay)
        self.mgr.save(iteration, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()
        if replay is not None and multi_host:
            path = self._replay_sidecar(iteration)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.savez(path, **_replay_state(replay))
            # Mirror orbax retention: drop sidecars for evicted steps.
            keep = set(self.mgr.all_steps())
            for f in os.listdir(os.path.dirname(path)):
                if f.endswith(".npz") and int(f[:-4]) not in keep:
                    os.remove(os.path.join(os.path.dirname(path), f))

    def latest_iteration(self) -> Optional[int]:
        return self.mgr.latest_step()

    def saved_extra_keys(self, iteration: Optional[int] = None) -> Tuple[str, ...]:
        """Keys of the ``extra`` payload the on-disk checkpoint was saved
        with (empty for ungated runs). Lets the caller build the matching
        restore template instead of guessing and catching mismatches."""
        step = iteration if iteration is not None else self.mgr.latest_step()
        if step is None:
            return ()
        extra = self.mgr.item_metadata(step).tree.get("extra", {})
        return tuple(extra.keys()) if isinstance(extra, dict) else ()

    def restore(
        self,
        train_state: TrainState,
        replay: Optional[ReplayBuffer],
        iteration: Optional[int] = None,
        extra_template: Optional[Dict[str, Any]] = None,
    ) -> Tuple[int, TrainState, jax.Array, Dict[str, Any]]:
        """Restore a checkpoint. ``extra_template`` must mirror the ``extra``
        payload the checkpoint was saved with (e.g. the gating incumbent
        params); it defaults to the empty dict of ungated runs."""
        step = iteration if iteration is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {
            "train_state": train_state,
            "rng": np.zeros(2, np.uint32),
        }
        if replay is not None or extra_template is not None:
            # Params-only callers (Elo ladders) must NOT include "extra":
            # on a GATED checkpoint the on-disk extra carries the incumbent
            # params dict, and an empty-dict template node makes orbax's
            # partial-restore trim raise a type mismatch. Omitting the key
            # is exactly what partial_restore is for.
            template["extra"] = extra_template or {}
        sidecar = self._replay_sidecar(step) if replay is not None else None
        use_sidecar = sidecar is not None and os.path.exists(sidecar)
        if replay is not None:
            if not use_sidecar:
                # Single-host layout: replay lives in the orbax payload.
                template["replay"] = _replay_state(replay)
            restored = self.mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
            if use_sidecar:
                with np.load(sidecar) as z:
                    restored = dict(restored)
                    restored["replay"] = {k: z[k] for k in z.files}
        else:
            # Params-only restore (e.g. the Elo ladder): skip the on-disk
            # replay payload. The manager's registered StandardCheckpointHandler
            # rejects PyTreeRestore args, so read the step's item directory with
            # a standalone PyTree checkpointer (Standard saves are PyTree
            # format on disk) and partial-restore just the template's keys.
            # partial_restore silently passes template-only leaves through
            # unrestored and returns on-disk shapes for the rest, so an
            # architecture mismatch (different --blocks / --norm / --channels)
            # would otherwise ladder a partially- or fully-fresh-init net.
            # Validate STRUCTURE AND SHAPES against the on-disk metadata
            # before restoring anything.
            meta = self.mgr.item_metadata(step).tree.get("train_state")
            if meta is not None:
                want = _leaf_path_shapes(template["train_state"])
                got = _leaf_path_shapes(meta)
                missing = sorted(set(want) - set(got))
                extra = sorted(set(got) - set(want))
                shape_diff = sorted(
                    p for p in set(want) & set(got) if want[p] != got[p]
                )
                if missing or extra or shape_diff:
                    detail = "; ".join(
                        filter(
                            None,
                            [
                                missing
                                and f"template-only leaves {missing[:4]}",
                                extra and f"on-disk-only leaves {extra[:4]}",
                                shape_diff
                                and (
                                    f"shape mismatches "
                                    f"{[(p, want[p], got[p]) for p in shape_diff[:4]]}"
                                ),
                            ],
                        )
                    )
                    raise ValueError(
                        f"checkpoint {self.directory}:{step} was saved with a "
                        f"different architecture than the restore template "
                        f"(check --channels/--blocks/--norm): {detail}"
                    )
            item_dir = os.path.join(self.directory, str(step), "default")
            with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
                restored = ckptr.restore(
                    item_dir,
                    args=ocp.args.PyTreeRestore(
                        item=template, partial_restore=True
                    ),
                )
        if replay is not None:
            _restore_replay(replay, restored["replay"])
        rng = jax.numpy.asarray(restored["rng"])
        return step, restored["train_state"], rng, restored.get("extra") or {}
