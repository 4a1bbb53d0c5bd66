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
from t48.exp.checkpoint import (
    AsyncCheckpointer,
    restore_checkpoint,
    restore_from_shards,
    save_process_shards,
)
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

    def save(self, light: bool = False) -> None:
        pass

    def close(self) -> None:
        pass


class ChunkWatchdog:
    """Multi-host failure detector (SURVEY.md §5).

    A peer process dying mid-run leaves the survivors blocked forever
    inside their next collective (the runtime has no timeout on CPU/Gloo
    and a very long one on TPU). The watchdog arms a timer around every
    chunk; if a chunk overruns the budget it assumes peer failure, dumps
    this process's addressable shards collective-free
    (``save_process_shards`` — the previous chunk's state is already
    materialized, so the host transfer does not queue behind the wedged
    collective) and exits. A secondary timer hard-exits in case the dump
    itself wedges. Exit codes: 42 dump written, 43 dump timed out.
    """

    def __init__(self, timeout_s: float, directory: str):
        import threading

        self._threading = threading
        self.timeout_s = timeout_s
        self.directory = directory
        self._timer = None
        self._state = None

    def arm(self, state) -> None:
        self.disarm()
        self._state = state
        self._timer = self._threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def disarm(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None

    def _fire(self) -> None:
        print(
            f"[t48] watchdog: chunk exceeded {self.timeout_s}s — assuming "
            f"peer failure; dumping shards to {self.directory}",
            flush=True,
        )
        killer = self._threading.Timer(
            max(self.timeout_s, 30.0), lambda: os._exit(43)
        )
        killer.daemon = True
        killer.start()
        try:
            save_process_shards(self.directory, self._state)
            print("[t48] watchdog: shard dump complete", flush=True)
        finally:
            os._exit(42)


class HostCounters:
    """Exact, overflow-proof run totals carried as Python ints.

    The device counts episodes and env steps in int32 (loop.py block
    comment on rebasing); at sustained rates ``env_steps`` wraps 2^31 in
    minutes. The host accumulates WRAP-AWARE deltas of the device
    readings — a per-chunk delta is always ≪ 2^31, so
    ``(cur − prev) mod 2^32`` recovers the true increment across any
    number of int32 wraps — into unbounded Python ints that feed loop
    control, the throughput meter and the metrics.

    ``number_base`` is the cumulative amount subtracted from the device
    episode counter by rebases; drains add it back to reconstruct
    absolute episode numbers.
    """

    # rebase long before int32 territory; any chunk gains ≪ this margin
    REBASE_AT = 1 << 30

    def __init__(self, episodes_dev: int, steps_dev: int, train_dev: int,
                 totals: Optional[dict] = None):
        totals = totals or {}
        self.episodes = int(totals.get("episodes", episodes_dev))
        self.env_steps = int(totals.get("env_steps", steps_dev))
        self.train_steps = int(totals.get("train_steps", train_dev))
        self.number_base = int(totals.get("number_base", 0))
        self._prev_episodes = int(episodes_dev)
        self._prev_steps = int(steps_dev)
        self._prev_train = int(train_dev)

    def update(self, episodes_dev: int, steps_dev: int,
               train_dev: int) -> None:
        self.episodes += (int(episodes_dev) - self._prev_episodes) % 2**32
        self.env_steps += (int(steps_dev) - self._prev_steps) % 2**32
        self.train_steps += (int(train_dev) - self._prev_train) % 2**32
        self._prev_episodes = int(episodes_dev)
        self._prev_steps = int(steps_dev)
        self._prev_train = int(train_dev)

    def note_rebase(self, amount: int) -> None:
        """The device episode counters were shifted down by ``amount``
        (a sync-period multiple): keep the delta arithmetic and the
        episode-number reconstruction consistent."""
        self._prev_episodes -= int(amount)
        self.number_base += int(amount)

    def totals(self) -> dict:
        """Persisted with the experiment so resume restores exact
        absolute counts (the checkpointed device ints alone lose the
        accumulated wraps/rebases)."""
        return {
            "episodes": self.episodes,
            "env_steps": self.env_steps,
            "train_steps": self.train_steps,
            "number_base": self.number_base,
        }


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
        # one batched transfer (4 separate device_gets cost 4 round
        # trips, ~25ms each on a remote-attached backend)
        boards, actions, rewards, dones = (
            np.asarray(x) for x in jax.device_get(tuple(snapshot))
        )
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


def latest_job(root_dir: str) -> str:
    """Resume-from-latest auto-discovery: the most recently saved job
    folder under ``root_dir`` (newest ``binary/checkpoint.npz`` or
    emergency shard dump). Deterministic across processes sharing the
    filesystem."""
    import glob

    candidates = []
    for pattern in ("*/binary/checkpoint.npz", "*/binary/emergency"):
        for f in glob.glob(os.path.join(root_dir, pattern)):
            candidates.append(
                (os.path.getmtime(f),
                 os.path.relpath(f, root_dir).split(os.sep)[0])
            )
    if not candidates:
        raise FileNotFoundError(
            f"no resumable job (binary/checkpoint.npz or binary/emergency) "
            f"under {root_dir!r}"
        )
    return max(candidates)[1]


def _load_counter_totals(job_dir: str) -> Optional[dict]:
    """The absolute run totals saved alongside the checkpoint
    (``HostCounters.totals``), readable by every process off the shared
    job dir. None for jobs saved before the overflow-proof counters."""
    import json

    path = os.path.join(job_dir, "text", "hyperparams.json")
    try:
        with open(path) as f:
            return json.load(f).get("counter_totals")
    except (OSError, ValueError):
        return None


def load_resume_state(job_dir: str, template):
    """Restore a job's training state, preferring whichever of the
    regular checkpoint and the emergency shard dump is newer.

    Returns (state, description). Emergency restores may be partial —
    leaves whose shard ranges are missing (a process died before
    writing) keep the template's fresh values; they are listed in the
    description."""
    ckpt = os.path.join(job_dir, "binary/checkpoint.npz")
    emergency = os.path.join(job_dir, "binary/emergency")
    t_ckpt = os.path.getmtime(ckpt) if os.path.exists(ckpt) else None
    has_em = os.path.isdir(emergency) and any(
        f.startswith("shards.proc") for f in os.listdir(emergency)
    )
    t_em = (
        max(
            os.path.getmtime(os.path.join(emergency, f))
            for f in os.listdir(emergency)
            if f.startswith("shards.proc")
        )
        if has_em
        else None
    )
    if t_ckpt is None and t_em is None:
        raise FileNotFoundError(f"no checkpoint under {job_dir}")
    if t_em is not None and (t_ckpt is None or t_em > t_ckpt):
        state, missing = restore_from_shards(emergency, template)
        desc = "emergency shard dump"
        if missing:
            desc += (
                f" (partial: {len(missing)} leaves incomplete, kept fresh "
                f"values: {[m.split('[')[0] for m in missing[:4]]}...)"
            )
        return state, desc
    return restore_checkpoint(ckpt, template), "checkpoint.npz"


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
    on_chunk=None,
):
    """Run (or resume) a full training job. Returns (state, experiment).

    ``data_parallel``: shard envs/replay over this many devices on a
    'data' mesh (0 = all visible devices; None = single-device). On a
    multi-host slice call ``t48.distrib.init_distributed()`` first; all
    artifact writes are then gated to process 0 (assumes the job dir is
    on a filesystem process 0 can write and — for resume — all processes
    can read, the standard TPU-pod arrangement).

    ``on_chunk``: optional callback ``(counters, meter) -> None`` invoked
    after every chunk's metrics land — periodic observability for soak
    runs / external monitors without touching the device path.
    """
    coordinator = jax.process_index() == 0
    multiprocess = jax.process_count() > 1
    verbose = verbose and coordinator
    if resume and job_name is None:
        # resume-from-latest auto-discovery (deterministic across
        # processes: same shared filesystem, same newest-mtime winner)
        job_name = latest_job(root_dir)
        if verbose:
            print(f"Resuming latest job: {job_name}")
    if multiprocess and job_name is None:
        raise ValueError(
            "multi-host training needs an explicit job_name: the "
            "coordinator's auto-generated exp_{n}_{hash} folder name is "
            "not knowable by the other processes (they must locate the "
            "job dir for emergency shard dumps and resume)"
        )
    if coordinator:
        experiment = Experiment(
            root_dir=root_dir, folder_name=job_name, resumed=resume,
            config=config, episode_retention=config.episode_retention,
        )
        experiment.add_hyperparameter(config.hyperparams_dict())
    else:
        experiment = NullExperiment()
    job_dir = experiment.folder if coordinator else os.path.join(
        root_dir, job_name
    )

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
        # distribute_train_state) — multi-host-safe. Prefers the newer of
        # the regular checkpoint and an emergency shard dump (partial
        # restores keep fresh values for missing shard ranges).
        state, source = load_resume_state(
            job_dir, loop_lib.create_train_state(config)
        )
        if verbose:
            print(f"Restored from {source}")
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
    # overflow-proof totals: device ints are int32 and may have been
    # rebased/wrapped; resumes restore the exact absolute counts saved
    # alongside the checkpoint (readable by every process off the shared
    # job dir)
    persisted_totals = _load_counter_totals(job_dir) if resume else None
    counters = HostCounters(
        int(state.episodes_done), int(state.env_steps),
        int(state.train_steps), persisted_totals,
    )
    last_save = counters.episodes
    last_save_t = time.monotonic()
    last_print = counters.episodes
    meter = ThroughputMeter()
    meter.update(counters.env_steps, counters.episodes)

    checkpointer = AsyncCheckpointer()

    def _save_all(light: bool = False):
        # HAPPY-PATH save: the gather is a collective — every process must
        # run it (all reach this point together between chunks). The host
        # transfer + npz write then run on the checkpointer's thread,
        # overlapped with the next chunk (no save-boundary stall).
        # ``light`` = periodic autosave: skip the O(episodes) pickle
        # rewrite (experiment.save docstring).
        ckpt_state = state
        if mesh is not None and multiprocess:
            from t48.distrib import fully_replicated

            ckpt_state = fully_replicated(state, mesh)
        if coordinator:
            experiment.add_hyperparameter({"counter_totals": counters.totals()})
            experiment.save(light=light)
            checkpointer.save(experiment.checkpoint_path, ckpt_state)

    def _emergency_save():
        # FAILURE-PATH save: collective-free. Whichever processes are
        # still alive each dump the shards they can address; params and
        # counters are replicated so any single survivor preserves the
        # model (t48/exp/checkpoint.py shard-dump design note).
        # T48_EMERGENCY_SHARDS forces the shard-dump path in a single
        # process too — failure drills at multi-DEVICE mesh geometries
        # (the 8-device dryrun) without needing multiple processes.
        if multiprocess or os.environ.get("T48_EMERGENCY_SHARDS"):
            d = save_process_shards(
                os.path.join(job_dir, "binary", "emergency"), state
            )
            print(f"[t48] emergency shard dump written: {d}")
        else:
            _save_all()
        if coordinator:
            # totals must accompany the (possibly rebased) shard dump:
            # a stale number_base would shift every post-resume episode
            # number by the missed rebase amount
            experiment.add_hyperparameter({"counter_totals": counters.totals()})
            experiment.save()

    # fault injection (SURVEY.md §5 failure-detection aux): raise at a
    # chosen episode count to exercise the emergency save path in tests
    fault_at = int(os.environ.get("T48_FAULT_INJECT_EPISODES", "0") or 0)

    watchdog = None
    # armed for multi-process runs (peer-failure detection); the
    # T48_WATCHDOG_FORCE hook arms it single-process for failure drills
    # at virtual-mesh geometries (it fires the same dump path)
    if config.watchdog_timeout_s and (
        multiprocess or os.environ.get("T48_WATCHDOG_FORCE")
    ):
        watchdog = ChunkWatchdog(
            config.watchdog_timeout_s,
            os.path.join(job_dir, "binary", "emergency"),
        )

    try:
        # PIPELINED chunk loop: chunk k+1 is dispatched (async, jax
        # futures) BEFORE chunk k's episode log is drained — the
        # host-side drain (device_get round-trip + metric processing,
        # ~tens of ms per call on a remote-attached backend) overlaps the
        # next chunk's device execution instead of idling the chip. Loop
        # control reads chunk k's counters; on exit the one extra
        # in-flight chunk is simply discarded (its state is never
        # observed), so the returned/saved state is the last one whose
        # metrics were drained.
        pending = chunk(state) if counters.episodes < target_episodes else None
        rebase_amt = 0
        first_chunk_timed = False
        while pending is not None:
            cur_state, snapshot = pending  # chunk k's output (in flight)
            # chunk k's log was numbered with the PRE-rebase counters —
            # capture its base before applying a pending rebase
            drain_base = counters.number_base
            if rebase_amt:
                # shift the device episode counters away from 2^31 before
                # dispatching the next chunk (loop.py rebasing note); all
                # processes compute the same amount from the replicated
                # counters, so the collective program order stays aligned
                cur_state = loop_lib.rebase_counters(cur_state, rebase_amt)
                counters.note_rebase(rebase_amt)
                rebase_amt = 0
            if watchdog is not None:
                watchdog.arm(state)  # state = last COMPLETED chunk
            # drain phase 1 first: the live-prefix log slice is a device
            # op — enqueued before chunk k+1 it runs right after chunk k
            # instead of waiting out the whole next chunk
            drain_handle = (
                loop_lib.start_drain(cur_state.log) if coordinator else None
            )
            # dispatch chunk k+1 behind k on the device queue
            pending = chunk(cur_state)
            episodes = []
            if coordinator:
                # transfers + record building overlap chunk k+1; stream
                # retention skips the O(episodes) dict build when the
                # native JSONL sink carries them
                episodes, dropped = loop_lib.finish_drain(
                    drain_handle, drain_base,
                    build_dicts=config.episode_retention != "stream",
                )
                # impossible by construction: the per-env slots are sized
                # to the provable per-chunk bound (loop.effective_log_size)
                assert dropped == 0, f"episode log overflow: dropped {dropped}"
                experiment.add_episodes(episodes)
                assembler.feed(snapshot)
            state = cur_state
            if watchdog is not None:
                watchdog.disarm()  # the drain proved chunk k completed
            # one batched transfer for both loop-control counters (two
            # separate int() casts cost two ~25ms round trips on a
            # remote-attached backend); the int32 device readings fold
            # into the exact host totals wrap-aware
            done_dev, steps_dev, train_dev = (
                int(x)
                for x in jax.device_get(
                    (state.episodes_done, state.env_steps,
                     state.train_steps)
                )
            )
            counters.update(done_dev, steps_dev, train_dev)
            done_now, steps_now = counters.episodes, counters.env_steps
            if done_dev > HostCounters.REBASE_AT:
                lt, ls = (
                    int(x)
                    for x in jax.device_get(
                        (state.last_train_episodes, state.last_sync_episodes)
                    )
                )
                rebase_amt = loop_lib.rebase_amount(config, done_dev, lt, ls)
            if not first_chunk_timed and steps_now:
                # first chunk of THIS process run done: drop compile time
                # from the rate window. (Guarding on total_steps == 0
                # never fired for resumed runs, whose meters then
                # amortized compile into the reported sustained rates —
                # r04 review finding.)
                meter.reset_baseline()
                first_chunk_timed = True
            if fault_at and done_now >= fault_at:
                raise RuntimeError(
                    f"fault injection: episodes_done={done_now} >= {fault_at}"
                )
            if done_now >= target_episodes:
                pending = None

            if config.debug_invariants:
                from t48.utils.debug import assert_env_invariants

                assert_env_invariants(state.env.boards, state.env.merge_scores)

            meter.update(steps_now, done_now)
            if on_chunk is not None:
                on_chunk(counters, meter)
            if verbose and episodes and done_now - last_print >= 10:
                ep = episodes[-1]
                # reference console line (dqn_lib.py:210-212)
                print(
                    f"Episode: {ep['number']}: {ep['merge_score']}, "
                    f"{ep['max_tile']}, {ep['number_moves']}"
                )
                last_print = done_now
            if done_now - last_save >= 1000 and (
                time.monotonic() - last_save_t
                >= config.autosave_min_interval_s
            ):
                _save_all(light=True)
                last_save = done_now
                last_save_t = time.monotonic()
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
        _emergency_save()
    except Exception:
        _emergency_save()
        print(f"\nSaving current experiment in {experiment.folder}\n")
        raise
    finally:
        if watchdog is not None:
            watchdog.disarm()
        checkpointer.flush()
        experiment.close()
    return state, experiment
