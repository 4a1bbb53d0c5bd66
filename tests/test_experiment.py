"""Experiment persistence, checkpoint/resume, trainer E2E, analysis."""

import json
import os
import pickle

import jax
import numpy as np
import pytest

from t48.analysis.report import (
    learning_curve_summary,
    load_episodes,
    max_tile_frequency,
    render_report,
)
from t48.configs import get_preset
from t48.exp.checkpoint import restore_checkpoint, save_checkpoint
from t48.exp.experiment import Experiment
from t48.train import loop as loop_lib
from t48.train.trainer import train


def tiny_config(**kw):
    base = dict(
        env_batch=8,
        batch_size=32,
        replay_buffer_length=512,
        no_episodes=40,
        no_episodes_to_reach_epsilon=20,
        no_episodes_before_training=3,
        no_episodes_before_updating_target=5,
        snapshot_game_every_n_episodes=8,
        chunk_iters=32,
        episode_log_size=256,
        seed=0,
    )
    base.update(kw)
    return get_preset("dense", **base)


class TestStreamRetentionAndOnChunk:
    def test_stream_retention_writes_jsonl_only(self, tmp_path):
        """episode_retention='stream' (soak/production): every episode
        lands in the incremental JSONL, none are held in memory, and the
        final episodes.p stays empty — O(1) memory at any run length."""
        cfg = tiny_config(episode_retention="stream")
        state, exp = train(
            cfg, root_dir=str(tmp_path), job_name="streamed", verbose=False
        )
        assert exp.episodes == []
        with open(tmp_path / "streamed/binary/episodes.p", "rb") as f:
            assert pickle.load(f) == []
        with open(tmp_path / "streamed/binary/episodes.jsonl") as f:
            lines = [json.loads(ln) for ln in f]
        totals = exp.hyperparameters["counter_totals"]
        assert len(lines) == totals["episodes"]
        nums = [e["number"] for e in lines]
        assert nums == sorted(nums)

    def test_on_chunk_callback_sees_running_totals(self, tmp_path):
        seen = []
        cfg = tiny_config()
        train(
            cfg, root_dir=str(tmp_path), job_name="cb", verbose=False,
            on_chunk=lambda counters, meter: seen.append(
                (counters.episodes, counters.env_steps)
            ),
        )
        assert len(seen) >= 2
        assert seen == sorted(seen)  # totals are monotone
        assert seen[-1][1] % (cfg.env_batch * cfg.chunk_iters) == 0

    def test_on_chunk_interrupt_saves_cleanly(self, tmp_path):
        """Raising KeyboardInterrupt from on_chunk (the soak's wall-clock
        stop) leaves a resumable job, like the reference's interrupt
        handling (dqn_lib.py:235-244)."""
        def stop(counters, meter):
            if counters.episodes > 0:
                raise KeyboardInterrupt("stop")

        cfg = tiny_config(no_episodes=100_000)
        state, exp = train(
            cfg, root_dir=str(tmp_path), job_name="stopme", verbose=False,
            on_chunk=stop,
        )
        assert os.path.exists(tmp_path / "stopme/binary/checkpoint.npz")
        totals = exp.hyperparameters["counter_totals"]
        assert 0 < totals["episodes"] < 100_000
        # and it resumes
        state2, exp2 = train(
            cfg, root_dir=str(tmp_path), job_name="stopme", resume=True,
            max_episodes=totals["episodes"] + 20, verbose=False,
        )
        assert exp2.hyperparameters["counter_totals"]["episodes"] >= (
            totals["episodes"] + 20
        )


class TestExperimentFolder:
    def test_layout_matches_reference(self, tmp_path):
        """Job dir mirrors experiments.py:67-73 text/ + binary/ layout."""
        exp = Experiment(root_dir=str(tmp_path), folder_name="myjob")
        assert os.path.isdir(exp._p("text"))
        assert os.path.isdir(exp._p("binary"))
        assert os.path.isdir(exp._p("binary/board_histories"))
        exp.add_hyperparameter({"learning_rate": 0.01})
        exp.add_episode(
            {"max_tile": 64, "merge_score": 600, "number": 0, "reward": 5.0,
             "q_value": 1.0, "epsilon": 0.9, "number_moves": 80}
        )
        exp.save()
        assert os.path.isfile(exp._p("text/hyperparams.json"))
        assert os.path.isfile(exp._p("text/runtime.txt"))
        assert os.path.isfile(exp._p("binary/hyperparameters.p"))
        assert os.path.isfile(exp._p("binary/runtime.p"))
        assert os.path.isfile(exp._p("binary/episodes.p"))
        with open(exp._p("binary/episodes.p"), "rb") as f:
            episodes = pickle.load(f)
        assert episodes[0]["max_tile"] == 64

    def test_auto_naming(self, tmp_path):
        e1 = Experiment(root_dir=str(tmp_path))
        e2 = Experiment(root_dir=str(tmp_path))
        n1 = os.path.basename(e1.folder)
        n2 = os.path.basename(e2.folder)
        assert n1.startswith("exp_1_")
        assert n2.startswith("exp_2_")

    def test_name_collision_falls_back(self, tmp_path):
        Experiment(root_dir=str(tmp_path), folder_name="dup")
        e2 = Experiment(root_dir=str(tmp_path), folder_name="dup")
        assert os.path.basename(e2.folder).startswith("exp_")

    def test_resume_restores_metadata(self, tmp_path):
        exp = Experiment(root_dir=str(tmp_path), folder_name="resume_me")
        exp.add_hyperparameter({"gamma": 0.8})
        exp.add_episode(
            {"max_tile": 32, "merge_score": 300, "number": 0, "reward": 3.0,
             "q_value": 0.5, "epsilon": 1.0, "number_moves": 50}
        )
        exp.save()
        exp.close()
        resumed = Experiment(
            root_dir=str(tmp_path), folder_name="resume_me", resumed=True
        )
        assert resumed.hyperparameters["gamma"] == 0.8
        assert len(resumed.episodes) == 1

    def test_save_games_played_appends(self, tmp_path):
        exp = Experiment(root_dir=str(tmp_path), folder_name="games")
        exp.save_games_played([["g1"], ["g2"]])
        exp.save_games_played([["g3"]])
        with open(exp._p("binary/games_played.p"), "rb") as f:
            games = pickle.load(f)
        assert len(games) == 3

    def test_cross_experiment_history(self, tmp_path):
        """Repo-level HISTORY.md accumulates each job's hyperparameters
        (the reference's hand-kept experiments.txt, C21)."""
        for name, lr in (("jobA", 0.01), ("jobB", 0.001)):
            exp = Experiment(root_dir=str(tmp_path), folder_name=name)
            exp.add_hyperparameter({"learning_rate": lr, "batch_size": 64})
            exp.save()
            exp.save()  # idempotent: one history block per job
        text = (tmp_path / "HISTORY.md").read_text()
        assert text.count("## jobA") == 1
        assert text.count("## jobB") == 1
        assert "learning_rate: 0.01" in text
        assert "learning_rate: 0.001" in text
        # resume does not duplicate the block
        resumed = Experiment(
            root_dir=str(tmp_path), folder_name="jobA", resumed=True
        )
        resumed.save()
        text = (tmp_path / "HISTORY.md").read_text()
        assert text.count("## jobA") == 1

    def test_snapshot_game(self, tmp_path):
        exp = Experiment(root_dir=str(tmp_path), folder_name="snap")
        history = [(np.zeros((4, 4)), "u", 4)]
        exp.snapshot_game(history, 500)
        path = exp._p("binary/board_histories/episode_500.p")
        with open(path, "rb") as f:
            loaded = pickle.load(f)
        assert loaded[0][1] == "u"


class TestCheckpoint:
    def test_roundtrip_full_train_state(self, tmp_path):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state)
        template = loop_lib.create_train_state(cfg)
        restored = restore_checkpoint(path, template)
        for a, b in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, tmp_path):
        """checkpoint → restore → chunk == chunk straight through
        (full-fidelity resume: replay, RNG and counters included)."""
        cfg = tiny_config()
        chunk = loop_lib.make_train_chunk(cfg)
        state = loop_lib.create_train_state(cfg)
        state, _ = chunk(state)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state)
        cont, _ = chunk(state)
        restored = restore_checkpoint(path, loop_lib.create_train_state(cfg))
        cont2, _ = chunk(restored)
        for a, b in zip(
            jax.tree_util.tree_leaves(cont), jax.tree_util.tree_leaves(cont2)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state)
        other = loop_lib.create_train_state(tiny_config(env_batch=16))
        with pytest.raises(ValueError):
            restore_checkpoint(path, other)

    def test_renamed_field_rejected(self, tmp_path):
        """Leaves are matched by pytree path: a renamed/missing field fails
        loudly with the offending names, never silently permutes."""
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state)
        with np.load(path) as data:
            arrays = {k: data[k] for k in data.files}
        # simulate a field rename in a future code version
        victim = next(k for k in arrays if ".episodes_done" in k)
        arrays[victim.replace("episodes_done", "episodes_completed")] = (
            arrays.pop(victim)
        )
        np.savez(path, **arrays)
        with pytest.raises(ValueError, match="episodes_"):
            restore_checkpoint(path, loop_lib.create_train_state(cfg))

    def test_restore_subtree_params_only(self, tmp_path):
        """Evaluation loads just `.params` without building the full
        TrainState (no replay/env/optimizer allocation)."""
        from t48.exp.checkpoint import restore_subtree

        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        chunk = loop_lib.make_train_chunk(cfg)
        state, _ = chunk(state)
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state)
        params = restore_subtree(
            path, jax.tree_util.tree_map(np.zeros_like, state.params), ".params"
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(state.params),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        with pytest.raises(ValueError, match="no leaf"):
            restore_subtree(path, state.params, ".nonexistent_field")

    def test_v1_positional_checkpoint_still_loads(self, tmp_path):
        """Round-1 checkpoints used positional leaf_{i} keys."""
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        path = str(tmp_path / "v1.npz")
        leaves = jax.tree_util.tree_leaves(state)
        np.savez(
            path,
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
        )
        restored = restore_checkpoint(path, loop_lib.create_train_state(cfg))
        for a, b in zip(leaves, jax.tree_util.tree_leaves(restored)):
            assert np.array_equal(np.asarray(a), np.asarray(b))


class TestAsyncCheckpointer:
    def test_overlapped_save_matches_sync(self, tmp_path):
        from t48.exp.checkpoint import AsyncCheckpointer

        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        sync_path = str(tmp_path / "sync.npz")
        async_path = str(tmp_path / "async.npz")
        save_checkpoint(sync_path, state)
        ck = AsyncCheckpointer()
        ck.save(async_path, state)
        ck.flush()
        with np.load(sync_path) as a, np.load(async_path) as b:
            assert set(a.files) == set(b.files)
            for f in a.files:
                assert np.array_equal(a[f], b[f]), f

    def test_error_surfaces_on_flush(self, tmp_path):
        from t48.exp.checkpoint import AsyncCheckpointer

        ck = AsyncCheckpointer()
        ck.save(str(tmp_path / "nodir" * 60 // 1 if False else "/proc/denied/x.npz"),
                {"a": np.zeros(3)})
        with pytest.raises(BaseException):
            ck.flush()


class TestShardDump:
    def test_roundtrip_single_process(self, tmp_path):
        """Dump + reassemble with full coverage (all shards local)."""
        from t48.exp.checkpoint import restore_from_shards, save_process_shards

        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        d = str(tmp_path / "emergency")
        save_process_shards(d, state)
        restored, missing = restore_from_shards(
            d, loop_lib.create_train_state(cfg)
        )
        assert missing == []
        for a, b in zip(
            jax.tree_util.tree_leaves(state),
            jax.tree_util.tree_leaves(restored),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_roundtrip_sharded_state(self, tmp_path):
        """Dump a mesh-sharded state: per-device shards reassemble."""
        from t48.distrib import distribute_train_state, make_mesh
        from t48.exp.checkpoint import restore_from_shards, save_process_shards

        cfg = tiny_config(env_batch=16)
        mesh = make_mesh()
        chunk = loop_lib.make_train_chunk(cfg)
        state = distribute_train_state(
            loop_lib.create_train_state(cfg), mesh, cfg
        )
        state, _ = chunk(state)
        d = str(tmp_path / "emergency")
        save_process_shards(d, state)
        restored, missing = restore_from_shards(
            d, loop_lib.create_train_state(cfg)
        )
        assert missing == []
        for a, b in zip(
            jax.tree_util.tree_leaves(state),
            jax.tree_util.tree_leaves(restored),
        ):
            assert np.array_equal(
                np.asarray(jax.device_get(a)), np.asarray(b)
            )

    def test_partial_coverage_reported(self, tmp_path):
        """Missing shard ranges (a dead process) keep template values and
        are reported; replicated leaves stay complete."""
        from t48.exp.checkpoint import restore_from_shards, save_process_shards

        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        d = str(tmp_path / "emergency")
        path = save_process_shards(d, state)
        # simulate a lost process: drop half of every env-sharded leaf
        with np.load(path) as data:
            kept = {}
            for f in data.files:
                if f.endswith("__idx0") or f.endswith("__shard0"):
                    kept[f] = data[f]
            # truncate the boards leaf's coverage to rows [0, B//2)
            bkeys = [k for k in kept if ".env.boards__idx0" in k]
            assert bkeys
            for k in bkeys:
                kept[k] = kept[k].copy()
                kept[k][0, 1] = cfg.env_batch // 2
                skey = k.replace("__idx0", "__shard0")
                kept[skey] = kept[skey][: cfg.env_batch // 2]
        np.savez(path, **kept)
        restored, missing = restore_from_shards(
            d, loop_lib.create_train_state(cfg)
        )
        assert any(".env.boards" in m for m in missing)
        assert not any(m.startswith(".params") for m in missing)
        assert np.array_equal(
            np.asarray(restored.env.boards[: cfg.env_batch // 2]),
            np.asarray(state.env.boards[: cfg.env_batch // 2]),
        )


class TestFailurePath:
    def test_fault_injection_leaves_resumable_job(self, tmp_path, monkeypatch):
        """Single-process fault injection: the exception path saves, and
        resume-from-latest auto-discovery + load_resume_state pick it up."""
        from t48.train.trainer import latest_job, load_resume_state

        cfg = tiny_config(no_episodes=100_000)
        monkeypatch.setenv("T48_FAULT_INJECT_EPISODES", "10")
        with pytest.raises(RuntimeError, match="fault injection"):
            train(cfg, root_dir=str(tmp_path), job_name="faulty", verbose=False)
        monkeypatch.delenv("T48_FAULT_INJECT_EPISODES")
        assert latest_job(str(tmp_path)) == "faulty"
        state, source = load_resume_state(
            str(tmp_path / "faulty"), loop_lib.create_train_state(cfg)
        )
        assert int(state.episodes_done) >= 10

    def test_resume_latest_via_train(self, tmp_path):
        """train(resume=True) with no job name resumes the newest job."""
        cfg = tiny_config(no_episodes=12)
        train(cfg, root_dir=str(tmp_path), job_name="older", verbose=False)
        train(cfg, root_dir=str(tmp_path), job_name="newer", verbose=False)
        os.utime(
            str(tmp_path / "newer" / "binary" / "checkpoint.npz"), None
        )
        state, exp = train(
            cfg.replace(no_episodes=20),
            root_dir=str(tmp_path),
            resume=True,
            verbose=False,
        )
        assert os.path.basename(exp.folder) == "newer"
        assert int(state.episodes_done) >= 20


class TestTrainerEndToEnd:
    def test_full_tiny_run(self, tmp_path):
        cfg = tiny_config()
        state, exp = train(
            cfg, root_dir=str(tmp_path), job_name="e2e", verbose=False
        )
        assert int(state.episodes_done) >= cfg.no_episodes
        episodes = load_episodes(exp.folder)
        assert len(episodes) >= cfg.no_episodes
        # artifacts exist
        assert os.path.isfile(os.path.join(exp.folder, "text/hyperparams.json"))
        assert os.path.isfile(exp.checkpoint_path)
        assert os.path.isfile(os.path.join(exp.folder, "text/config.json"))
        snaps = os.listdir(os.path.join(exp.folder, "binary/board_histories"))
        assert snaps  # snapshot env produced at least one playback
        with open(os.path.join(exp.folder, "text/hyperparams.json")) as f:
            hp = json.load(f)
        assert hp["batch_size"] == cfg.batch_size

    def test_resume_from_checkpoint(self, tmp_path):
        cfg = tiny_config(no_episodes=30)
        state1, exp1 = train(
            cfg, root_dir=str(tmp_path), job_name="resumable", verbose=False
        )
        exp1.close()
        cfg2 = cfg.replace(no_episodes=60)
        state2, exp2 = train(
            cfg2,
            root_dir=str(tmp_path),
            job_name="resumable",
            resume=True,
            verbose=False,
        )
        assert int(state2.episodes_done) >= 60
        assert int(state2.episodes_done) > int(state1.episodes_done)


class TestAnalysis:
    def test_report(self, tmp_path):
        cfg = tiny_config()
        state, exp = train(
            cfg, root_dir=str(tmp_path), job_name="report", verbose=False
        )
        report = render_report(exp.folder)
        assert report["learning_curve"]["total_episodes"] >= cfg.no_episodes
        freq = report["max_tile_frequency"]
        assert sum(v["count"] for v in freq.values()) >= cfg.no_episodes
        total_pct = sum(v["percent"] for v in freq.values())
        assert total_pct == pytest.approx(100.0, abs=1.0)
        assert os.path.isfile(os.path.join(exp.folder, "analysis.json"))
        # vs-reference comparison is part of every report
        cmp = report["vs_reference"]
        assert cmp["truncated"]  # tiny run < 17,758-episode checkpoint
        assert any(r["reference_count"] == 7344 for r in cmp["rows"])
        ours_total = sum(r["ours_count"] for r in cmp["rows"])
        assert ours_total == cmp["checkpoint_episodes"]

    def test_vs_reference_formatting(self):
        from t48.analysis.report import (
            compare_to_reference,
            format_reference_comparison,
        )

        episodes = [
            {"max_tile": t, "number": i}
            for i, t in enumerate([128] * 40 + [256] * 30 + [512] * 4)
        ]
        cmp = compare_to_reference(episodes)
        txt = format_reference_comparison(cmp)
        assert "128" in txt and "41.36%" in txt
        assert "frac >=128" in txt

    def test_analysis_png_has_vlines(self, tmp_path):
        """The rendered png exists when matplotlib is present; the vline
        inputs (hyperparams) round-trip from the job folder."""
        cfg = tiny_config()
        state, exp = train(
            cfg, root_dir=str(tmp_path), job_name="vlines", verbose=False
        )
        render_report(exp.folder)
        try:
            import matplotlib  # noqa: F401
        except Exception:
            pytest.skip("matplotlib unavailable")
        assert os.path.isfile(os.path.join(exp.folder, "analysis.png"))
