"""Mesh + NamedSharding runtime: the TPU-native distribution backend.

The reference has no distribution at all — its entire backend story is
``"cuda:0" if torch.cuda.is_available() else "cpu"``
(/root/reference/src/device/__init__.py:4-8). This module is the net-new
component SURVEY.md §2.3 mandates:

- one global ``Mesh`` with a ``data`` axis (and a ``model`` axis stub so
  the design isn't DP-only by construction — the Q-nets at ≤0.4M params
  never need sharding, SURVEY.md §2.3);
- env batch, per-env accumulators and the replay buffer shard over
  ``data`` (every device steps its own envs and owns a replay shard);
- params/optimizer state replicate; the learner's gradient reduction is
  the only cross-device traffic, emitted by XLA as an ICI all-reduce
  when the jitted train chunk runs over sharded inputs (the
  annotate-shardings-let-GSPMD-insert-collectives recipe);
- multi-host process groups come from ``jax.distributed.initialize``.

No hand-written communication: shardings are declared on the
``TrainState`` leaves and the *unchanged* jitted train chunk
(t48/train/loop.py) compiles into an SPMD program over the mesh. With
the per-env replay rings (t48/replay/buffer.py) every insert and every
sampled transition is shard-local; the learner's parameter-gradient
all-reduce is the only large collective in the compiled step
(asserted on the HLO in tests/test_sharding.py).

Multi-host: construction is **process-local** — fresh states are built
by a jitted init with ``out_shardings`` (each process materializes only
its addressable shards), and host-global states (checkpoint restores)
are placed with ``jax.make_array_from_callback`` (each process serves
only the shard indices it owns). No host ever builds or transfers a
global array it doesn't own a piece of, which is what a real multi-host
slice requires (non-addressable devices reject ``jax.device_put``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t48.configs.presets import T48Config


def init_distributed(**kwargs) -> None:
    """Initialize the multi-host process group (idempotent wrapper over
    ``jax.distributed.initialize``). Call once per host before building
    the mesh on a multi-host slice."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data mesh (with a trailing model-axis stub) over all devices.

    ``n_data`` defaults to ``len(devices) // n_model``. On a multi-host
    slice ``jax.devices()`` spans every host, so the same call builds the
    global mesh everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    grid = np.array(devices).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def train_state_shardings(state, mesh: Mesh, config: T48Config):
    """A pytree of ``NamedSharding``s matching a ``TrainState``.

    Placement is *structural*: the batch-shaped fields (env state, per-env
    accumulators) and the replay arrays shard their leading axis on
    ``data``; params, target params, optimizer state, counters and the
    episode-log ring replicate. (A shape-based rule would misfire — e.g.
    a 16-wide dense kernel looks like a 16-env batch.)
    """
    del config
    data = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def all_leaves(subtree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, subtree)

    # replay rows are cell-major [components, ring, B] — the env/'data'
    # axis is MINOR (t48/replay/buffer.py layout note)
    replay_sh = state.replay.replace(
        rows=NamedSharding(mesh, P(None, None, "data")),
        ptr=replicated,
        fill=replicated,
    )
    return state.replace(
        params=all_leaves(state.params, replicated),
        target_params=all_leaves(state.target_params, replicated),
        opt_state=all_leaves(state.opt_state, replicated),
        env=all_leaves(state.env, data),
        ep_reward_sum=data,
        ep_q_sum=data,
        replay=replay_sh,
        rng=replicated,
        episodes_done=replicated,
        env_steps=replicated,
        train_steps=replicated,
        last_train_episodes=replicated,
        last_sync_episodes=replicated,
        last_loss=replicated,
        log=all_leaves(state.log, replicated),
    )


def distribute_train_state(state, mesh: Mesh, config: T48Config):
    """Place a host-global ``TrainState`` onto the mesh with the DP layout.

    Multi-host-safe: each leaf is placed with
    ``jax.make_array_from_callback``, so every process fetches only the
    index ranges of the shards it owns — unlike ``jax.device_put``, which
    fails on non-addressable devices. Use for states every host holds in
    full (fresh host-side creations, checkpoint restores); fresh
    distributed states are better built directly with
    ``create_train_state(config, mesh=mesh)`` (process-local jitted init,
    no host-global intermediate).
    """
    shardings = train_state_shardings(state, mesh, config)

    def place(x, sharding):
        arr = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(place, state, shardings)


def fully_replicated(state, mesh: Mesh):
    """Gather a mesh-sharded pytree into fully-replicated form (a jitted
    identity with replicated out-shardings — XLA emits the all-gathers).
    After this every process can ``device_get`` every leaf, which is what
    host-0-gated checkpointing needs on a multi-host slice. Must be
    called by ALL processes (it is a collective program)."""
    rep = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: rep, state)
    return jax.jit(lambda s: s, out_shardings=shardings)(state)
