"""Experiment persistence: job folders, metrics, snapshots, provenance.

Mirrors the reference ``Experiment`` (/root/reference/src/experiments.py:
40-160) artifact-for-artifact so downstream analysis tooling carries over:

  experiments/<job>/
    text/hyperparams.json        — hyperparameter dump (experiments.py:130)
    text/runtime.txt             — HH:MM:SS wall clock (experiments.py:133-136)
    text/config.json             — full T48Config (provenance; the TPU-native
                                   analogue of the driver-source copy at
                                   experiments.py:84-87)
    binary/hyperparameters.p     — pickled hyperparams (experiments.py:138)
    binary/runtime.p             — pickled seconds (experiments.py:141)
    binary/episodes.p            — pickled list of per-episode metric dicts
                                   (experiments.py:144; schema at :112-122)
    binary/episodes.jsonl        — same episodes, written incrementally
                                   (TPU-native addition: crash-safe, no
                                   read-modify-write)
    binary/checkpoint.npz        — full TrainState (replaces model.pt;
                                   experiments.py:147-148)
    binary/board_histories/episode_<n>.p — snapshotted game playbacks
                                   (experiments.py:124-126)
    binary/games_played.p        — evaluation game histories
                                   (experiments.py:150-160)

Auto-naming follows ``exp_{n}_{hash}`` (experiments.py:100-102). Episode
metric dicts use the exact reference keys: max_tile, merge_score, number,
reward, q_value, epsilon, number_moves.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import List, Optional


class Experiment:
    """One training/evaluation job directory."""

    def __init__(
        self,
        root_dir: str = "experiments",
        folder_name: Optional[str] = None,
        resumed: bool = False,
        config=None,
        episode_retention: str = "full",
    ):
        # 'stream': episodes go to the incremental JSONL only (O(1)
        # memory; soak/production runs — configs.episode_retention)
        self.episode_retention = episode_retention
        os.makedirs(root_dir, exist_ok=True)
        if resumed:
            assert folder_name, "resume requires a folder name"
            self.folder = os.path.join(root_dir, folder_name)
            assert os.path.isdir(self.folder), (
                f"You wish to resume an experiment which does not exist: "
                f"{folder_name}"
            )
            with open(self._p("binary/hyperparameters.p"), "rb") as f:
                self.hyperparameters = pickle.load(f)
            with open(self._p("binary/runtime.p"), "rb") as f:
                prior_runtime = pickle.load(f)
            # episodes.p may be absent: stream-retention runs keep only
            # the JSONL, and committed evidence folders are pruned to
            # episodes.jsonl.gz (r05). Resume with an empty in-memory
            # list in that case — the JSONL on disk remains the record.
            if os.path.isfile(self._p("binary/episodes.p")):
                with open(self._p("binary/episodes.p"), "rb") as f:
                    self.episodes = pickle.load(f)
            else:
                self.episodes = []
            # continue the wall clock from the recorded elapsed time
            self.runtime = time.time() - prior_runtime
        else:
            self.folder = self._create_folder(root_dir, folder_name)
            os.makedirs(self._p("text"), exist_ok=True)
            os.makedirs(self._p("binary"), exist_ok=True)
            os.makedirs(self._p("binary/board_histories"), exist_ok=True)
            self.hyperparameters = {}
            self.episodes: List[dict] = []
            self.runtime = time.time()
            if config is not None:
                with open(self._p("text/config.json"), "w") as f:
                    f.write(config.to_json())
        # JSONL episodes are buffered and appended with a short-lived handle
        # per flush (add_episodes / save / close) — no leaked file handle.
        self._jsonl_pending: List[str] = []
        self._root_dir = root_dir
        self._history_written = resumed  # resumes don't re-log (C21)

    # ------------------------------------------------------------------

    def _p(self, *parts) -> str:
        return os.path.join(self.folder, *parts)

    @staticmethod
    def _create_folder(root_dir: str, folder_name: Optional[str]) -> str:
        if folder_name:
            path = os.path.join(root_dir, folder_name)
            try:
                os.mkdir(path)
                return path
            except FileExistsError:
                print(
                    f"File {folder_name} already exists. "
                    "Different folder name will be used."
                )
        # exp_{n}_{hash} auto-naming (experiments.py:100-102)
        existing = [f for f in os.listdir(root_dir) if f.startswith("exp_")]
        latest = 0
        for name in existing:
            try:
                latest = max(latest, int(name.split("_")[1]))
            except (IndexError, ValueError):
                continue
        tag = abs(hash(time.time_ns())) % (10**12)
        path = os.path.join(root_dir, f"exp_{latest + 1}_{tag}")
        os.mkdir(path)
        return path

    @property
    def checkpoint_path(self) -> str:
        return self._p("binary/checkpoint.npz")

    # ------------------------------------------------------------------

    def add_hyperparameter(self, mapping: dict) -> None:
        """Merge a dict of hyperparameters (experiments.py:104-110)."""
        assert isinstance(mapping, dict), (
            "When adding hyperparameters, pass them as dict"
        )
        self.hyperparameters.update(mapping)

    def add_episode(self, episode: dict) -> None:
        """Record one completed episode's metrics (reference schema,
        experiments.py:112-122) — also appended crash-safely to JSONL
        at the next flush (add_episodes / save / close)."""
        self.episodes.append(episode)
        self._jsonl_pending.append(json.dumps(episode))

    def add_episodes(self, episodes: List[dict]) -> None:
        """Bulk episode ingest. Formats the JSONL lines with a fixed
        f-string template instead of per-dict ``json.dumps`` — ~4×
        faster, and this runs for every completed episode (hundreds of
        thousands per second at large env batches). Falls back to
        ``json.dumps`` for episodes that don't match the standard
        7-key schema."""
        if self.episode_retention != "stream":
            self.episodes.extend(episodes)
        jsonl = getattr(episodes, "jsonl", None)
        if jsonl is not None:
            # native episode sink (t48/native): pre-formatted bytes —
            # flush any pending Python-formatted lines first to keep
            # file order, then append directly
            self._flush_jsonl()
            with open(self._p("binary/episodes.jsonl"), "ab") as f:
                f.write(jsonl)
            return
        try:
            lines = [
                f'{{"max_tile": {e["max_tile"]}, '
                f'"merge_score": {e["merge_score"]}, '
                f'"number": {e["number"]}, '
                f'"reward": {e["reward"]!r}, '
                f'"q_value": {e["q_value"]!r}, '
                f'"epsilon": {e["epsilon"]!r}, '
                f'"number_moves": {e["number_moves"]}}}'
                for e in episodes
            ]
        except (KeyError, TypeError):
            lines = [json.dumps(e) for e in episodes]
        self._jsonl_pending.extend(lines)
        self._flush_jsonl()

    def _flush_jsonl(self) -> None:
        if self._jsonl_pending:
            with open(self._p("binary/episodes.jsonl"), "a") as f:
                f.write("\n".join(self._jsonl_pending) + "\n")
            self._jsonl_pending = []

    def snapshot_game(self, board_history, episode: int) -> None:
        """Persist one game's playback: list of (state ndarray, action
        char, reward) tuples (experiments.py:124-126; produced by
        dqn_lib.py:199-200)."""
        path = self._p("binary/board_histories", f"episode_{episode}.p")
        with open(path, "wb") as f:
            pickle.dump(board_history, f)

    def _append_history(self) -> None:
        """Append this job's hyperparameters to the repo-level
        ``<root_dir>/HISTORY.md`` — the cross-experiment hyperparameter
        history the reference keeps by hand in experiments.txt
        (experiments.txt:1-69, SURVEY.md C21). Once per job."""
        if self._history_written or not self.hyperparameters:
            return
        path = os.path.join(self._root_dir, "HISTORY.md")
        lines = [f"## {os.path.basename(self.folder)}"]
        lines.append(f"- started: {time.strftime('%Y-%m-%d %H:%M:%S')}")
        for key in sorted(self.hyperparameters):
            if key in ("throughput", "eval_summary",
                       "eval_summary_lookahead", "counter_totals"):
                continue  # run outputs, not hyperparameters
            lines.append(f"- {key}: {self.hyperparameters[key]}")
        with open(path, "a") as f:
            f.write("\n".join(lines) + "\n\n")
        self._history_written = True

    def save(self, light: bool = False) -> None:
        """Write all metadata artifacts (experiments.py:128-148).

        ``light=True`` (periodic autosaves) skips re-pickling the full
        episode list — at round-3 training rates (~250k episodes/s) the
        reference's rewrite-everything autosave becomes O(N²) host work
        and throttles the device; ``binary/episodes.jsonl`` is the
        incremental (crash-safe) episode record, and the final/exception
        save writes ``episodes.p`` for reference-layout parity.
        """
        self._append_history()
        with open(self._p("text/hyperparams.json"), "w") as f:
            json.dump(self.hyperparameters, f, indent=4, default=str)
        elapsed = time.time() - self.runtime
        with open(self._p("text/runtime.txt"), "w") as f:
            f.write(time.strftime("%H:%M:%S", time.gmtime(elapsed)))
        with open(self._p("binary/hyperparameters.p"), "wb") as f:
            pickle.dump(self.hyperparameters, f)
        with open(self._p("binary/runtime.p"), "wb") as f:
            pickle.dump(round(elapsed, 2), f)
        if not light:
            with open(self._p("binary/episodes.p"), "wb") as f:
                pickle.dump(self.episodes, f)
        self._flush_jsonl()

    def save_games_played(self, games_history: list) -> None:
        """Append evaluation games to the growing games_played.p pickle
        (read-modify-write, experiments.py:150-160)."""
        path = self._p("binary/games_played.p")
        total = []
        if os.path.isfile(path):
            with open(path, "rb") as f:
                total = pickle.load(f)
        total += games_history
        with open(path, "wb") as f:
            pickle.dump(total, f)

    def close(self) -> None:
        """Flush any buffered JSONL episodes (idempotent)."""
        self._flush_jsonl()
