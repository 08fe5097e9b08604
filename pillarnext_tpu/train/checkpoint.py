"""Checkpoint I/O (Orbax).

Parity with the reference checkpoint layer (trainer/utils/checkpoint.py:8-89,
trainer/trainer/trainer.py:72-92): per-epoch checkpoints carrying
{meta{epoch, step}, params, batch_stats, opt_state}, resume restoring all of
them, plus latest-checkpoint discovery for automatic crash recovery (the
failure-recovery subsystem the reference lacks — SURVEY.md §5).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str | Path, epoch: int, state, extra: dict | None = None):
    """Write ``epoch_{n}`` under ``directory`` (rank 0 in multi-process —
    orbax coordinates internally)."""
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"epoch_{epoch}"
    payload = {
        "meta": {"epoch": epoch, "step": int(state.step)},
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str | Path) -> dict[str, Any]:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve())


def latest_checkpoint(directory: str | Path) -> Path | None:
    directory = Path(directory)
    if not directory.exists():
        return None
    best = None
    best_epoch = -1
    for p in directory.iterdir():
        m = re.fullmatch(r"epoch_(\d+)", p.name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = p, int(m.group(1))
    return best


def restore_into_state(state, payload: dict):
    """Rebuild a TrainState from a checkpoint payload (strict structure —
    like load_checkpoint(strict=True), checkpoint.py:8-44)."""
    import jax.numpy as jnp

    # orbax round-trips tuples/namedtuples (optax states) as lists/dicts;
    # rebuild through the live state's treedef by flattened leaf order.
    leaves, treedef = jax.tree.flatten(state.opt_state)
    new_leaves = jax.tree.leaves(payload["opt_state"])
    assert len(leaves) == len(new_leaves), (len(leaves), len(new_leaves))
    opt_state = jax.tree.unflatten(treedef, [jnp.asarray(x) for x in new_leaves])

    return state.replace(
        step=jnp.asarray(payload["meta"]["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, payload["params"]),
        batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
        opt_state=opt_state,
    )
