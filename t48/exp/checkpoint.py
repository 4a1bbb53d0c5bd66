"""Full-fidelity checkpoint / resume for the training state.

The reference's resume restores only the model (experiments.py:51-65 +
torch.load), silently dropping optimizer state, replay buffer and RNG.
SURVEY.md §3.4 mandates a deliberate superset: the whole ``TrainState``
pytree — params, target params, optimizer state, env state, per-env
accumulators, replay buffer, RNG key, counters and the episode-log ring —
is one flat npz. Restore rebuilds the pytree from a template created by
``create_train_state(config)``, so the treedef never needs serializing.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    """Atomically write ``state`` (any pytree) to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_checkpoint(path: str, template):
    """Load a checkpoint written by ``save_checkpoint`` into the structure
    of ``template`` (same config ⇒ same treedef and shapes)."""
    template_leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        count = len(data.files)
        if count != len(template_leaves):
            raise ValueError(
                f"checkpoint has {count} leaves, template has "
                f"{len(template_leaves)} — config mismatch?"
            )
        leaves = [data[f"leaf_{i}"] for i in range(count)]
    for i, (got, want) in enumerate(zip(leaves, template_leaves)):
        want_shape = np.shape(want)
        if tuple(got.shape) != tuple(want_shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {got.shape} != template "
                f"{want_shape} — config mismatch?"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
