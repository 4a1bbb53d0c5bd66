"""Env-batch widening: replay-preserving TrainState surgery.

Curve-vs-episode-number comparisons at a large env batch suffer a
structural startup wave: the first ``env_batch`` episodes are all played
by the untrained initial policy before any update can influence them
(experiments/README.md, round 3). The fix is a STAGED schedule — train
the first few thousand episodes at a small batch (reference-like early
curve), then widen to the performance batch. This module performs the
widening between the two phases:

- params / target params / optimizer state / RNG / all counters carry
  over unchanged (the learner is batch-agnostic);
- the old envs' boards, merge scores and step counts occupy the first
  ``B_old`` slots of the new env state — their in-flight episodes
  continue; ``B_new − B_old`` fresh envs start new games (played by the
  already-trained policy, which is the point of the staged schedule);
- the replay buffer's live transitions are re-distributed into the new
  per-env rings in CHRONOLOGICAL insertion order (oldest first), so the
  ring's evict-oldest semantics and uniform sampling are preserved; if
  the new geometry holds fewer rows, the oldest surplus is dropped
  (exactly what the ring would have evicted next);
- the episode log is recreated for the new batch (it is drained every
  chunk; nothing live crosses a widening, which happens between runs).

This is a cold-path host-side operation (numpy, once per phase change),
used by the staged flagship driver via checkpoint rewrite + resume.

No reference analogue (the reference is single-board); net-new machinery
mandated by the rebuild's own curve-fidelity/throughput goals
(VERDICT r03 tasks 1 and 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from t48.configs.presets import T48Config
from t48.env import engine
from t48.replay import buffer as replay_lib
from t48.train import loop as loop_lib


def widen_replay(rs: replay_lib.ReplayState, new_env_batch: int,
                 new_capacity: int) -> replay_lib.ReplayState:
    """Re-distribute the live transitions into ``new_env_batch`` rings.

    Live rows are ordered chronologically (ring position relative to the
    write head, oldest first; every env inserts in lockstep so one slot
    = one timestep across all envs), flattened, truncated to whole
    new-batch steps (dropping the OLDEST surplus), and reshaped into the
    new [slots, envs] geometry with the write head right after the
    newest row.
    """
    rows = np.asarray(jax.device_get(rs.rows))  # [R, M0, B0]
    r, m0, b0 = rows.shape
    fill = int(jax.device_get(rs.fill))
    ptr = int(jax.device_get(rs.ptr))
    m1 = replay_lib.per_env_capacity(new_capacity, new_env_batch)

    # chronological slot order, oldest -> newest
    if fill >= m0:  # full ring: oldest is the next write slot
        order = [(ptr + i) % m0 for i in range(m0)]
    else:  # not yet wrapped: slots 0..fill-1 in insertion order
        order = list(range(fill))
    live = rows[:, order, :]  # [R, F, B0] chronological
    flat = live.reshape(r, -1)  # [R, F*B0] (slot-major = time-major)

    total = flat.shape[1]
    keep_steps = min(total // new_env_batch, m1)
    kept = flat[:, total - keep_steps * new_env_batch:]
    new_rows = np.zeros((r, m1, new_env_batch), rows.dtype)
    if keep_steps:
        new_rows[:, :keep_steps, :] = kept.reshape(
            r, keep_steps, new_env_batch
        )
    return replay_lib.ReplayState(
        rows=jnp.asarray(new_rows),
        ptr=jnp.int32(keep_steps % m1),
        fill=jnp.int32(keep_steps),
    )


def widen_train_state(
    state: loop_lib.TrainState,
    old_config: T48Config,
    new_config: T48Config,
) -> loop_lib.TrainState:
    """TrainState surgery: ``old_config.env_batch`` → ``new_config.env_batch``
    (see module docstring). Everything except env/replay/accumulators/log
    carries over unchanged."""
    b0, b1 = old_config.env_batch, new_config.env_batch
    if b1 < b0:
        raise ValueError(f"widening only: {b0} -> {b1}")
    if new_config.board_k != old_config.board_k:
        raise ValueError("board size cannot change across a widening")
    k = new_config.board_k

    # fresh envs for the new slots, keyed off the carried run RNG
    key_new, key_run = jax.random.split(jnp.asarray(state.rng))
    fresh = engine.init(key_new, b1 - b0, k, new_config.p_four) if b1 > b0 else None
    old_env = state.env

    def cat(a, b):
        return jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0)

    env = engine.EnvState(
        boards=cat(old_env.boards, fresh.boards) if fresh else old_env.boards,
        merge_scores=cat(old_env.merge_scores, fresh.merge_scores)
        if fresh else old_env.merge_scores,
        step_counts=cat(old_env.step_counts, fresh.step_counts)
        if fresh else old_env.step_counts,
    )
    pad = jnp.zeros((b1 - b0,), jnp.float32)
    return state.replace(
        env=env,
        ep_reward_sum=cat(state.ep_reward_sum, pad),
        ep_q_sum=cat(state.ep_q_sum, pad),
        replay=widen_replay(
            state.replay, b1, new_config.replay_buffer_length
        ),
        rng=key_run,
        log=loop_lib._create_log(
            loop_lib.effective_log_size(new_config), b1
        ),
    )


def widen_job_checkpoint(job_dir: str, old_config: T48Config,
                         new_config: T48Config) -> None:
    """Rewrite a job's checkpoint in place for the new env batch, so a
    subsequent ``train(new_config, resume=True)`` continues the SAME
    experiment (one continuous curve artifact) at the wider batch."""
    import os

    from t48.exp.checkpoint import restore_checkpoint, save_checkpoint

    path = os.path.join(job_dir, "binary", "checkpoint.npz")
    # Guard (r04 advisor finding): resume prefers whichever of the
    # checkpoint and the emergency shard dump is NEWER
    # (trainer.load_resume_state). Widening only rewrites checkpoint.npz;
    # if phase 1 crashed and left a newer emergency dump, the post-widen
    # resume would restore the un-widened shards into the widened
    # template — shape mismatch at best, silently stale state at worst.
    # Refuse and tell the operator to resolve the dump first (resume the
    # old config to fold it into a fresh checkpoint, or delete it).
    emergency = os.path.join(job_dir, "binary", "emergency")
    if os.path.isdir(emergency):
        shard_times = [
            os.path.getmtime(os.path.join(emergency, f))
            for f in os.listdir(emergency)
            if f.startswith("shards.proc")
        ]
        if shard_times and (
            not os.path.exists(path)
            or max(shard_times) > os.path.getmtime(path)
        ):
            raise RuntimeError(
                f"{emergency} holds shard dumps newer than the checkpoint; "
                f"resume under the old config to fold them into "
                f"checkpoint.npz (or remove the dump) before widening — "
                f"otherwise the post-widen resume would restore un-widened "
                f"state"
            )
    template = loop_lib.create_train_state(old_config)
    state = restore_checkpoint(path, template)
    widened = widen_train_state(state, old_config, new_config)
    save_checkpoint(path, widened)
    # provenance: the job now runs under the new config
    with open(os.path.join(job_dir, "text", "config.json"), "w") as f:
        f.write(new_config.to_json())
