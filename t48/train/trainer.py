"""Host-side training driver: chunks, metrics drain, snapshots, saves.

The TPU-native equivalent of the reference's per-episode host loop
(/root/reference/src/dqn_lib.py:167-244): the device runs
``config.chunk_iters`` lockstep iterations per call (t48/train/loop.py);
between chunks the host drains the episode-metrics ring into the
``Experiment``, reassembles the snapshot env's game histories, prints the
reference's per-10-episodes console line (dqn_lib.py:210-212), autosaves
every 1000 episodes (dqn_lib.py:229-231) and saves on interrupt/exception
(dqn_lib.py:235-244).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import numpy as np

from t48.configs.presets import T48Config
from t48.exp.checkpoint import restore_checkpoint, save_checkpoint
from t48.exp.experiment import Experiment
from t48.train import loop as loop_lib
from t48.utils.tracing import ThroughputMeter

_ACTION_CHARS = ["u", "d", "l", "r"]


class NullExperiment:
    """No-op experiment for non-coordinator processes on a multi-host
    slice: every artifact write (job folder, metrics, snapshots,
    checkpoint) is gated to ``jax.process_index() == 0``; the other hosts
    run the same device program against this shim."""

    folder = "<non-coordinator>"
    checkpoint_path = "<non-coordinator>"

    def add_hyperparameter(self, mapping: dict) -> None:
        pass

    def add_episodes(self, episodes) -> None:
        pass

    def snapshot_game(self, board_history, episode: int) -> None:
        pass

    def save(self) -> None:
        pass

    def close(self) -> None:
        pass


class SnapshotAssembler:
    """Reassembles env 0's per-step stream into complete game histories.

    History entries match the reference's board_history tuples:
    ``(state ndarray of raw tile values, action char, reward)``
    (dqn_lib.py:199-200). With ``env_batch == 1`` the snapshot cadence is
    exactly the reference's every-N-episodes; with larger batches env 0
    completes ~1/B of all episodes, so games are snapshotted every
    ``max(1, N // env_batch)`` env-0 games (documented approximation).
    """

    def __init__(self, experiment: Experiment, cadence: int, env_batch: int, k: int):
        self.experiment = experiment
        self.snap_every_games = max(1, cadence // max(env_batch, 1))
        self.k = k
        self.env_batch = env_batch
        self.current: List[tuple] = []
        self.games_completed = 0

    def feed(self, snapshot: loop_lib.SnapshotStream) -> None:
        boards = np.asarray(jax.device_get(snapshot.board))
        actions = np.asarray(jax.device_get(snapshot.action))
        rewards = np.asarray(jax.device_get(snapshot.reward))
        dones = np.asarray(jax.device_get(snapshot.done))
        for t in range(boards.shape[0]):
            exps = boards[t].astype(np.int64).reshape(self.k, self.k)
            values = np.where(exps == 0, 0, 2**exps)
            self.current.append(
                (values, _ACTION_CHARS[int(actions[t]) % 4], int(rewards[t]))
            )
            if dones[t]:
                if self.games_completed % self.snap_every_games == 0:
                    # name by the approximate global episode ordinal so the
                    # artifact layout matches binary/board_histories/episode_N.p
                    number = self.games_completed * self.env_batch
                    self.experiment.snapshot_game(self.current, number)
                self.games_completed += 1
                self.current = []


def seed_replay_from_search(state, config: T48Config):
    """A*-seeded replay warm-start (reference: double_dqn_conv_sss.py:65 →
    state_space_search.py:104-131), with the reference's state/next_state
    and reward-sign bugs fixed (SURVEY.md §7.8)."""
    from t48.search.seeding import generate_replay_transitions

    transitions = generate_replay_transitions(
        games=config.astar_games,
        max_expansions=config.astar_max_expansions,
        k=config.board_k,
        seed=config.seed,
    )
    from t48.replay import buffer as replay_lib

    replay = replay_lib.add_many(state.replay, transitions)
    return state.replace(replay=replay)


def train(
    config: T48Config,
    root_dir: str = "experiments",
    job_name: Optional[str] = None,
    resume: bool = False,
    max_episodes: Optional[int] = None,
    verbose: bool = True,
    data_parallel: Optional[int] = None,
):
    """Run (or resume) a full training job. Returns (state, experiment).

    ``data_parallel``: shard envs/replay over this many devices on a
    'data' mesh (0 = all visible devices; None = single-device). On a
    multi-host slice call ``t48.distrib.init_distributed()`` first; all
    artifact writes are then gated to process 0 (assumes the job dir is
    on a filesystem process 0 can write and — for resume — all processes
    can read, the standard TPU-pod arrangement).
    """
    coordinator = jax.process_index() == 0
    verbose = verbose and coordinator
    if coordinator:
        experiment = Experiment(
            root_dir=root_dir, folder_name=job_name, resumed=resume, config=config
        )
        experiment.add_hyperparameter(config.hyperparams_dict())
    else:
        experiment = NullExperiment()

    mesh = None
    if data_parallel is not None:
        from t48.distrib import make_mesh

        n = data_parallel if data_parallel > 0 else len(jax.devices())
        if config.env_batch % n:
            raise ValueError(
                f"env_batch ({config.env_batch}) must be divisible by the "
                f"data-parallel degree {n} (the replay buffer shards with "
                "the envs: one sub-ring per env)"
            )
        mesh = make_mesh(n_data=n)

    if resume:
        # every process restores the host-global checkpoint, then places
        # only its own shards (make_array_from_callback inside
        # distribute_train_state) — multi-host-safe
        ckpt_path = os.path.join(
            root_dir, job_name, "binary/checkpoint.npz"
        ) if not coordinator else experiment.checkpoint_path
        state = restore_checkpoint(
            ckpt_path, loop_lib.create_train_state(config)
        )
        if mesh is not None:
            from t48.distrib import distribute_train_state

            state = distribute_train_state(state, mesh, config)
    elif config.use_astar_seed:
        if verbose:
            print(f"Seeding replay buffer from {config.astar_games} search games...")
        # the seed is deterministic in config.seed, so every process
        # computes identical transitions; placement happens after
        state = loop_lib.create_train_state(config)
        state = seed_replay_from_search(state, config)
        if verbose:
            print(f"Replay seeded with {int(state.replay.total_fill)} transitions")
        if mesh is not None:
            from t48.distrib import distribute_train_state

            state = distribute_train_state(state, mesh, config)
    else:
        # fresh start: process-local construction — each device
        # materializes its own shards directly from the jitted init
        state = loop_lib.create_train_state(config, mesh=mesh)
    if mesh is not None and verbose:
        print(
            f"Distributed over {mesh.shape['data']}-device data mesh "
            f"({jax.process_count()} process(es))"
        )

    chunk = loop_lib.make_train_chunk(config, mesh=mesh)
    assembler = SnapshotAssembler(
        experiment,
        config.snapshot_game_every_n_episodes,
        config.env_batch,
        config.board_k,
    )

    target_episodes = max_episodes if max_episodes is not None else config.no_episodes
    last_save = int(state.episodes_done)
    last_print = int(state.episodes_done)
    meter = ThroughputMeter()
    meter.update(int(state.env_steps), int(state.episodes_done))

    multiprocess = jax.process_count() > 1

    def _save_all():
        # the gather is a collective — every process must run it before
        # process 0 writes the checkpoint
        ckpt_state = state
        if mesh is not None and multiprocess:
            from t48.distrib import fully_replicated

            ckpt_state = fully_replicated(state, mesh)
        if coordinator:
            experiment.save()
            save_checkpoint(experiment.checkpoint_path, ckpt_state)

    try:
        while int(state.episodes_done) < target_episodes:
            state, snapshot = chunk(state)
            episodes = []
            if coordinator:
                episodes, dropped = loop_lib.drain_episode_log(state.log)
                # impossible by construction: the per-env slots are sized
                # to the provable per-chunk bound (loop.effective_log_size)
                assert dropped == 0, f"episode log overflow: dropped {dropped}"
                experiment.add_episodes(episodes)
                assembler.feed(snapshot)

            if config.debug_invariants:
                from t48.utils.debug import assert_env_invariants

                assert_env_invariants(state.env.boards, state.env.merge_scores)

            done_now = int(state.episodes_done)
            meter.update(int(state.env_steps), done_now)
            if verbose and episodes and done_now - last_print >= 10:
                ep = episodes[-1]
                # reference console line (dqn_lib.py:210-212)
                print(
                    f"Episode: {ep['number']}: {ep['merge_score']}, "
                    f"{ep['max_tile']}, {ep['number_moves']}"
                )
                last_print = done_now
            if done_now - last_save >= 1000:
                _save_all()
                last_save = done_now
                if verbose:
                    s = meter.summary()
                    print(
                        f"Saved game  [{done_now} episodes, "
                        f"{s['env_steps_per_s']:,.0f} env-steps/s, "
                        f"{s['episodes_per_s']:,.1f} episodes/s]"
                    )
            experiment.add_hyperparameter({"throughput": meter.summary()})
        _save_all()
    except KeyboardInterrupt as e:
        print(e)
        print(
            f"\nKeyboard interrupt caught. Saving current experiment in "
            f"{experiment.folder}"
        )
        _save_all()
    except Exception:
        _save_all()
        print(f"\nSaving current experiment in {experiment.folder}\n")
        raise
    finally:
        experiment.close()
    return state, experiment
