"""Counter-overflow proofing (VERDICT r03 weak #2 / r04 task 2).

The device carries int32 counters; at sustained round-3 rates
``env_steps`` crosses 2^31 in ~195s and ``episodes_done`` in ~7h. The
fix under test: wrap-aware host accumulation (trainer.HostCounters),
device-side episode-counter rebasing (loop.rebase_counters), absolute
episode-number reconstruction at drain (finish_drain number_base), and
the Pallas seed no longer deriving from the wrapping step counter.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t48.configs import get_preset
from t48.exp.checkpoint import save_checkpoint
from t48.exp.experiment import Experiment
from t48.train import loop as loop_lib
from t48.train import trainer as trainer_lib


def tiny_config(**kw):
    base = dict(
        arch="dense",
        env_batch=16,
        chunk_iters=32,
        batch_size=32,
        replay_buffer_length=256,
        no_episodes_before_training=0,
        no_episodes_to_reach_epsilon=20,
        no_episodes_before_updating_target=10,
        max_updates_per_iteration=1,
        use_astar_seed=False,
        env_backend="xla",
        seed=3,
    )
    base.update(kw)
    return get_preset("dense", **base)


class TestHostCounters:
    def test_accumulates_across_int32_wrap(self):
        # device counter wraps 2^31 -> negative; host total is exact
        c = trainer_lib.HostCounters(0, 2**31 - 100, 0)
        wrapped = np.int32(np.uint32((2**31 - 100) + 4096))  # negative
        c.update(0, int(wrapped), 0)
        assert c.env_steps == 2**31 - 100 + 4096  # crossed 2^31
        c.update(0, int(np.int32(np.uint32(wrapped + 4096))), 0)
        assert c.env_steps == 2**31 - 100 + 8192

    def test_train_steps_accumulate_across_wrap(self):
        # the learner-update counter wraps on the same timescale as the
        # episode counter at full cadence (r04 review finding)
        c = trainer_lib.HostCounters(0, 0, 2**31 - 10)
        wrapped = int(np.int32(np.uint32(2**31 - 10 + 50)))
        c.update(0, 0, wrapped)
        assert c.train_steps == 2**31 + 40

    def test_resume_restores_absolute_totals(self):
        totals = {"episodes": 5_000_000_000, "env_steps": 7_000_000_000,
                  "train_steps": 4_900_000_000,
                  "number_base": 4_999_000_000}
        c = trainer_lib.HostCounters(1_000_000, 123, 7, totals)
        assert c.episodes == 5_000_000_000
        c.update(1_000_100, 123 + 512, 9)
        assert c.episodes == 5_000_000_100
        assert c.env_steps == 7_000_000_512
        assert c.train_steps == 4_900_000_002

    def test_note_rebase_keeps_deltas_and_numbering(self):
        c = trainer_lib.HostCounters(2**30 + 500, 0, 0)
        c.note_rebase(2**30)
        assert c.number_base == 2**30
        c.update(520, 0, 0)  # device now reads the rebased value + 20
        assert c.episodes == 2**30 + 520


class TestRebase:
    def test_amount_preserves_all_schedule_invariants(self):
        cfg = tiny_config()
        sync = cfg.no_episodes_before_updating_target
        gate = cfg.no_episodes_before_training
        keep = loop_lib.rebase_keep_min(cfg)
        for done, lt, ls in [
            (2**30 + 12345, 2**30 + 12340, 2**30 + 12300),
            (2**30, 2**30 - 7, 2**30 - 3),
            (keep + sync, keep, keep + 1),
            (keep - 1, 0, 0),  # nothing to subtract
        ]:
            amt = loop_lib.rebase_amount(cfg, done, lt, ls)
            assert amt % sync == 0
            assert amt >= 0
            if amt:
                # residue mod sync preserved -> target-sync cadence intact
                assert (done - amt) % sync == done % sync
                # all counters stay in the saturated-schedule regime
                assert min(done, lt, ls) - amt >= keep
                # learner deficit invariant
                assert (done - amt) - max(lt - amt, gate) == done - max(lt, gate)

    def test_unbounded_lag_is_clamped_so_protection_still_works(self):
        """Under-cadenced configs grow the learner deficit without bound;
        the rebase clamps lags to REBASE_LAG_CAP so episodes_done can
        always be pulled back from 2^31 (r04 review finding)."""
        cfg = tiny_config()
        done = 2**30 + 777
        lt = ls = 0  # e.g. with_learner=False bench chunks never advance
        amt = loop_lib.rebase_amount(cfg, done, lt, ls)
        assert amt > 0
        assert done - amt < 2**21  # pulled into the safe band
        state = loop_lib.create_train_state(cfg)
        state = state.replace(
            episodes_done=jnp.int32(done),
            last_train_episodes=jnp.int32(lt),
            last_sync_episodes=jnp.int32(ls),
        )
        out = loop_lib.rebase_counters(state, amt)
        assert int(out.episodes_done) == done - amt
        # clamped lags stay within the cap of the rebased counter
        assert (
            int(out.episodes_done) - int(out.last_train_episodes)
            <= loop_lib.REBASE_LAG_CAP
        )
        assert int(out.last_train_episodes) >= 0
        # a sync is still (correctly) pending after the clamp
        sync = cfg.no_episodes_before_updating_target
        assert (int(out.episodes_done) // sync) > (
            int(out.last_sync_episodes) // sync
        )

    def test_rebase_counters_shifts_only_episode_counters(self):
        cfg = tiny_config()
        state = loop_lib.create_train_state(cfg)
        state = state.replace(
            episodes_done=jnp.int32(2**30 + 999),
            last_train_episodes=jnp.int32(2**30 + 998),
            last_sync_episodes=jnp.int32(2**30 + 900),
            env_steps=jnp.int32(777),
        )
        out = loop_lib.rebase_counters(state, 2**30)
        assert int(out.episodes_done) == 999
        assert int(out.last_train_episodes) == 998
        assert int(out.last_sync_episodes) == 900
        assert int(out.env_steps) == 777  # untouched
        assert int(out.train_steps) == int(state.train_steps)


class TestDrainNumberBase:
    def test_absolute_numbers_past_2pow31(self):
        cfg = tiny_config()
        chunk = loop_lib.make_train_chunk(cfg)
        state = loop_lib.create_train_state(cfg)
        # pretend the device counter was rebased down from a huge total
        base = 6_000_000_000
        episodes = []
        for _ in range(12):  # episodes last ~110+ steps; find a busy chunk
            state, _ = chunk(state)
            episodes, dropped = loop_lib.drain_episode_log(state.log, base)
            assert dropped == 0
            if episodes:
                break
        assert episodes, "no chunk completed an episode (lengthen chunks)"
        nums = [e["number"] for e in episodes]
        assert nums == sorted(nums)
        assert all(n >= base for n in nums)
        assert max(n for n in nums) > 2**31
        # the native JSONL sink (if built) must agree with the dicts
        if episodes.jsonl is not None:
            lines = episodes.jsonl.decode().strip().split("\n")
            assert [json.loads(ln)["number"] for ln in lines] == nums


class TestDrainBuildDictsGating:
    def test_stream_mode_without_native_falls_back_to_full_dicts(self, monkeypatch):
        """build_dicts=False relies on the native JSONL sink; when the
        native formatter is unavailable the Python path still needs the
        dicts — finish_drain must fall back to building all of them."""
        from t48 import native

        cfg = tiny_config()
        chunk = loop_lib.make_train_chunk(cfg)
        state = loop_lib.create_train_state(cfg)
        for _ in range(12):
            state, _ = chunk(state)
            handle = loop_lib.start_drain(state.log)
            full, _ = loop_lib.finish_drain(handle, 0, build_dicts=True)
            if full:
                break
        assert full

        def boom(rows, base=0):
            raise RuntimeError("no native")

        monkeypatch.setattr(native, "format_episodes_jsonl", boom)
        handle = loop_lib.start_drain(state.log)
        episodes, _ = loop_lib.finish_drain(handle, 0, build_dicts=False)
        assert episodes.jsonl is None
        assert [e["number"] for e in episodes] == [
            e["number"] for e in full
        ]

    def test_stream_mode_with_native_keeps_last_dict_only(self):
        from t48 import native

        if not native.available():
            pytest.skip("native lib unavailable")
        cfg = tiny_config()
        chunk = loop_lib.make_train_chunk(cfg)
        state = loop_lib.create_train_state(cfg)
        full = []
        for _ in range(12):
            state, _ = chunk(state)
            handle = loop_lib.start_drain(state.log)
            full, _ = loop_lib.finish_drain(handle, 5, build_dicts=True)
            if len(full) >= 2:
                break
        assert len(full) >= 2
        handle = loop_lib.start_drain(state.log)
        lean, _ = loop_lib.finish_drain(handle, 5, build_dicts=False)
        assert lean.jsonl is not None
        assert len(lean) == 1 and lean[0] == full[-1]
        # the JSONL still carries every episode
        lines = [json.loads(ln) for ln in lean.jsonl.decode().splitlines()]
        assert [e["number"] for e in lines] == [e["number"] for e in full]


class TestTrainCrosses2Pow31:
    def test_resumed_run_crosses_2pow31_steps(self, tmp_path):
        """End-to-end: a seeded counter state just below 2^31 total env
        steps resumes, runs chunks across the int32 wrap AND a >2^30
        episode-counter rebase, keeps loop control/metrics correct, and
        logs absolute episode numbers."""
        cfg = tiny_config()
        root = str(tmp_path)
        # --- forge a job checkpoint whose device counters sit at the edge
        state = loop_lib.create_train_state(cfg)
        done_dev = 2**30 + 12345
        steps_dev = 2**31 - 3 * cfg.env_batch * cfg.chunk_iters
        ep_total = 5_000_012_345
        state = state.replace(
            episodes_done=jnp.int32(done_dev),
            last_train_episodes=jnp.int32(done_dev - 2),
            last_sync_episodes=jnp.int32(done_dev - 5),
            env_steps=jnp.int32(steps_dev),
        )
        exp = Experiment(root_dir=root, folder_name="edge", config=cfg)
        exp.add_hyperparameter(cfg.hyperparams_dict())
        exp.add_hyperparameter(
            {
                "counter_totals": {
                    "episodes": ep_total,
                    "env_steps": steps_dev,
                    "number_base": ep_total - done_dev,
                }
            }
        )
        exp.save()
        save_checkpoint(exp.checkpoint_path, state)
        exp.close()

        out_state, out_exp = trainer_lib.train(
            cfg,
            root_dir=root,
            job_name="edge",
            resume=True,
            max_episodes=ep_total + 60,
            verbose=False,
        )
        # loop control terminated at the absolute target (not 2^31-poisoned)
        totals = out_exp.hyperparameters["counter_totals"]
        assert ep_total + 60 <= totals["episodes"] < ep_total + 5000
        # env-step total crossed 2^31 exactly by the chunks run
        chunks = (totals["env_steps"] - steps_dev) // (
            cfg.env_batch * cfg.chunk_iters
        )
        assert totals["env_steps"] == steps_dev + chunks * cfg.env_batch * cfg.chunk_iters
        assert totals["env_steps"] > 2**31
        # the throughput metric consumed the exact host totals
        tp = out_exp.hyperparameters["throughput"]
        assert tp["total_env_steps"] == totals["env_steps"]
        assert tp["total_episodes"] == totals["episodes"]
        # the >2^30 device counter was rebased back to the safe band
        assert int(out_state.episodes_done) < trainer_lib.HostCounters.REBASE_AT
        assert int(out_state.episodes_done) >= loop_lib.rebase_keep_min(cfg)
        # episode records carry ABSOLUTE numbers continuing the sequence
        nums = [e["number"] for e in out_exp.episodes]
        assert nums and nums == sorted(nums)
        assert nums[0] >= ep_total
        assert nums[-1] >= ep_total + 60
        # rebase preserved the sync residue: the device counter and the
        # absolute total agree modulo the sync period
        sync = cfg.no_episodes_before_updating_target
        assert (
            int(out_state.episodes_done) % sync
            == (totals["episodes"] - totals["number_base"] + 0) % sync
        )

    def test_rebased_run_matches_unrebased_metrics(self):
        """The rebase is semantically invisible: two identical states —
        one with episode counters shifted up by a large sync multiple —
        produce identical learner/sync behavior over a chunk."""
        cfg = tiny_config()
        chunk = loop_lib.make_train_chunk(cfg)
        state = loop_lib.create_train_state(cfg)
        # advance past the warmup/ε horizon so schedules are saturated
        # (the shift must not change ε: both sides must sit at the floor)
        for _ in range(15):
            state, _ = chunk(state)
        assert int(state.episodes_done) >= cfg.no_episodes_to_reach_epsilon
        shift = (2**29 // cfg.no_episodes_before_updating_target) * (
            cfg.no_episodes_before_updating_target
        )
        shifted = state.replace(
            episodes_done=state.episodes_done + shift,
            last_train_episodes=state.last_train_episodes + shift,
            last_sync_episodes=state.last_sync_episodes + shift,
        )
        out_a, _ = chunk(state)
        out_b, _ = chunk(shifted)
        assert int(out_b.episodes_done) - int(out_a.episodes_done) == shift
        assert int(out_b.train_steps) == int(out_a.train_steps)
        assert int(out_b.last_sync_episodes) - int(out_a.last_sync_episodes) == shift
        np.testing.assert_array_equal(
            np.asarray(out_a.env.boards), np.asarray(out_b.env.boards)
        )
        np.testing.assert_allclose(
            np.asarray(out_a.last_loss), np.asarray(out_b.last_loss)
        )
