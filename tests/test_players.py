"""Baseline players: random, up-left, greedy model; batched evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t48.baselines import players
from t48.env.golden import GoldenBoard


class TestPolicies:
    def test_random_policy_only_picks_legal(self):
        legal = jnp.array([[False, True, False, False]] * 64)
        boards = jnp.zeros((64, 4, 4), jnp.int32)
        actions = players.random_policy(jax.random.PRNGKey(0), boards, legal)
        assert (np.asarray(actions) == 1).all()

    def test_upleft_priority(self):
        cases = [
            ([True, True, True, True], 0),    # up first
            ([False, True, True, True], 2),   # then left
            ([False, True, False, True], 1),  # then down
            ([False, False, False, True], 3), # then right
        ]
        for mask, expect in cases:
            legal = jnp.array([mask])
            a = players.upleft_policy(None, jnp.zeros((1, 4, 4), jnp.int32), legal)
            assert int(a[0]) == expect, mask


class TestPlayGames:
    def test_random_games_complete(self):
        results = players.play_games(
            players.random_policy, 64, jax.random.PRNGKey(0), max_steps=1024
        )
        stats = players.summarize(results)
        assert stats["games"] == 64
        assert stats["unfinished"] == 0
        assert stats["best_max_tile"] >= 16
        assert stats["mean_merge_score"] > 0
        assert stats["mean_moves"] > 20

    def test_upleft_beats_nothing_burger(self):
        r_rand = players.play_games(
            players.random_policy, 128, jax.random.PRNGKey(1), max_steps=2048
        )
        r_up = players.play_games(
            players.upleft_policy, 128, jax.random.PRNGKey(1), max_steps=2048
        )
        s_rand = players.summarize(r_rand)
        s_up = players.summarize(r_up)
        assert s_up["unfinished"] == 0
        # both are weak baselines; just sanity-check they're in range
        assert s_up["mean_merge_score"] > 100
        assert s_rand["mean_merge_score"] > 100

    def test_history_recording(self):
        results, history = players.play_games(
            players.random_policy,
            4,
            jax.random.PRNGKey(2),
            max_steps=512,
            record_history=True,
        )
        boards, actions, rewards, merge_scores, dones = history
        assert boards.shape == (512, 4, 16)
        assert merge_scores.shape == (512, 4)
        d = np.asarray(dones)
        # every game eventually flags done
        assert d.any(axis=0).all()
        # cumulative merge score is non-decreasing over each game
        ms = np.asarray(merge_scores)
        assert (np.diff(ms, axis=0) >= 0).all()

    def test_player_facade_with_experiment(self, tmp_path):
        from t48.exp.experiment import Experiment

        exp = Experiment(root_dir=str(tmp_path), folder_name="eval")
        player = players.Player(experiment=exp)
        stats = player.play_n_games(8, random=True, max_steps=512,
                                    record_history=True)
        assert stats["games"] == 8
        import os
        import pickle

        with open(os.path.join(exp.folder, "binary/games_played.p"), "rb") as f:
            games = pickle.load(f)
        assert len(games) == 8
        # history tuples are (raw-value board, action char, reward,
        # merge_score) — the reference play_game layout (player.py:60)
        board, action, reward, merge_score = games[0][0]
        assert board.shape == (4, 4)
        assert action in "udlr"
        assert merge_score >= reward >= 0
        # last entry's cumulative merge score dominates any step reward
        assert games[0][-1][3] >= max(step[2] for step in games[0])


class TestUpleftGolden:
    def test_literal_loop_terminates(self):
        import random

        random.seed(0)
        np.random.seed(0)
        board, history = players.basic_upleft_algorithm()
        assert board.merge_score() > 0
        assert len(history) > 4
        # history tuple layout (player.py:72): (state, action, simple, merge)
        state, action, simple, merge = history[0]
        assert action in ("up", "left", "down", "r")
