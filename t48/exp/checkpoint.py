"""Full-fidelity checkpoint / resume for the training state.

The reference's resume restores only the model (experiments.py:51-65 +
torch.load), silently dropping optimizer state, replay buffer and RNG.
SURVEY.md §3.4 mandates a deliberate superset: the whole ``TrainState``
pytree — params, target params, optimizer state, env state, per-env
accumulators, replay buffer, RNG key, counters and the episode-log ring —
is one flat npz.

Format (version 2): each leaf is stored under its **pytree path string**
(``jax.tree_util.keystr``), e.g. ``.params['params']['Dense_0']['kernel']``,
plus a ``__t48_ckpt_version__`` tag. Restore matches leaves *by name*
against a template created by ``create_train_state(config)``, so a
pytree-order change in flax/optax cannot silently permute leaves, and a
renamed/missing field fails with the offending paths spelled out.
``restore_subtree`` loads just a sub-pytree (e.g. params for evaluation)
without allocating the rest of the state.

Version-1 checkpoints (positional ``leaf_{i}`` keys) are still readable.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

FORMAT_VERSION = 2
_VERSION_KEY = "__t48_ckpt_version__"


def _named_leaves(tree) -> dict:
    """{pytree path string: leaf} for every leaf of ``tree``."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in leaves}


def _to_savable(arr: np.ndarray) -> np.ndarray:
    """npz can't represent bf16 (ml_dtypes saves as raw void bytes);
    store it widened to exact f32 — restore casts back per the template."""
    if arr.dtype.name == "bfloat16":
        return arr.astype(np.float32)
    return arr


def save_checkpoint(path: str, state) -> None:
    """Atomically write ``state`` (any pytree) to ``path`` (.npz)."""
    arrays = {
        key: _to_savable(np.asarray(jax.device_get(leaf)))
        for key, leaf in _named_leaves(state).items()
    }
    arrays[_VERSION_KEY] = np.asarray(FORMAT_VERSION, np.int32)
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


def _check_shapes(pairs) -> None:
    for key, got, want in pairs:
        want_shape = tuple(np.shape(want))
        if tuple(got.shape) != want_shape:
            raise ValueError(
                f"checkpoint leaf {key} has shape {tuple(got.shape)}, template "
                f"expects {want_shape} — config mismatch?"
            )


def _cast_like(got: np.ndarray, want) -> np.ndarray:
    """Cast a loaded array to the template leaf's dtype (restores bf16
    leaves stored widened to f32; a no-op for every matching dtype).
    Void arrays (an ml_dtypes leaf that went through np.savez raw) are
    reinterpreted bit-for-bit when the item sizes match."""
    want_dtype = np.asarray(want).dtype if not hasattr(want, "dtype") else want.dtype
    if got.dtype == want_dtype:
        return got
    if got.dtype.kind == "V" and got.dtype.itemsize == want_dtype.itemsize:
        return got.view(want_dtype)
    return got.astype(want_dtype)


def restore_checkpoint(path: str, template):
    """Load a checkpoint written by ``save_checkpoint`` into the structure
    of ``template`` (same config ⇒ same paths and shapes). Leaves are
    matched by pytree path; missing or unexpected names raise."""
    keyed, treedef = jax.tree_util.tree_flatten_with_path(template)
    with np.load(path) as data:
        files = set(data.files)
        if _VERSION_KEY not in files and any(
            f.startswith("leaf_") for f in files
        ):
            return _restore_v1(data, keyed, treedef)
        files.discard(_VERSION_KEY)
        want = {jax.tree_util.keystr(p) for p, _ in keyed}
        missing = sorted(want - files)
        extra = sorted(files - want)
        if missing or extra:
            raise ValueError(
                "checkpoint/template leaf-name mismatch — config or code "
                f"version drift? missing from checkpoint: {missing[:8]}; "
                f"unexpected in checkpoint: {extra[:8]}"
            )
        loaded = [
            (jax.tree_util.keystr(p), data[jax.tree_util.keystr(p)], leaf)
            for p, leaf in keyed
        ]
    _check_shapes(loaded)
    return jax.tree_util.tree_unflatten(
        treedef, [_cast_like(g, w) for _, g, w in loaded]
    )


def _restore_v1(data, keyed, treedef):
    """Read the round-1 positional ``leaf_{i}`` layout."""
    count = sum(1 for f in data.files if f.startswith("leaf_"))
    if count != len(keyed):
        raise ValueError(
            f"v1 checkpoint has {count} leaves, template has {len(keyed)} "
            "— config mismatch?"
        )
    loaded = [
        (jax.tree_util.keystr(p), data[f"leaf_{i}"], leaf)
        for i, (p, leaf) in enumerate(keyed)
    ]
    _check_shapes(loaded)
    return jax.tree_util.tree_unflatten(
        treedef, [_cast_like(g, w) for _, g, w in loaded]
    )


def restore_subtree(path: str, template, prefix: str):
    """Restore only the sub-pytree stored under ``prefix`` (a pytree-path
    string like ``.params``) into ``template`` (the sub-pytree's own
    structure). Lets evaluation load params without building the full
    TrainState (replay buffer, env, optimizer)."""
    keyed, treedef = jax.tree_util.tree_flatten_with_path(template)
    with np.load(path) as data:
        files = set(data.files)
        loaded = []
        for p, leaf in keyed:
            key = prefix + jax.tree_util.keystr(p)
            if key not in files:
                raise ValueError(
                    f"checkpoint {path} has no leaf {key} "
                    f"(is this a v1 positional checkpoint, or wrong prefix?)"
                )
            loaded.append((key, data[key], leaf))
    _check_shapes(loaded)
    return jax.tree_util.tree_unflatten(
        treedef, [_cast_like(g, w) for _, g, w in loaded]
    )
