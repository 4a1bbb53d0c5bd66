"""Baseline players: random, up-left, greedy model; batched evaluation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t48.baselines import players
from t48.env import engine
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


class TestLookaheadPolicy:
    """r05 capability demo: depth-1 expectimax over the learned Q
    (players.lookahead_model_policy)."""

    def _policy(self):
        from t48.agent.networks import build_network
        from t48.train.loop import encoder_for

        net = build_network("conv")
        enc = encoder_for("conv", 4)
        params = net.init(
            jax.random.PRNGKey(0), enc(jnp.zeros((1, 16), jnp.int8))
        )
        return players.lookahead_model_policy(
            net.apply, params, enc, gamma=0.95
        )

    def test_actions_always_legal(self):
        pol = self._policy()
        key = jax.random.PRNGKey(1)
        env = engine.init(key, 32)
        boards = env.boards
        for i in range(3):
            _, _, legal = jax.jit(engine.peek_all)(boards)
            acts = np.asarray(pol(key, boards, np.asarray(legal)))
            legal_np = np.asarray(legal)
            for b in range(32):
                assert legal_np[b, acts[b]], (b, acts[b], legal_np[b])
            env, _, done = jax.jit(engine.step)(
                env, jnp.asarray(acts), jax.random.fold_in(key, i)
            )
            env = jax.jit(engine.reset_where)(
                env, done, jax.random.fold_in(key, 100 + i)
            )
            boards = env.boards

    def test_prefers_immediate_merge_on_zero_net(self):
        """With a zero-output Q net, the score reduces to the immediate
        merge delta: the policy must take a merging move over a sliding
        move."""
        zero_apply = lambda params, x: jnp.zeros((x.shape[0], 4))  # noqa: E731
        pol = players.lookahead_model_policy(
            zero_apply, None, lambda x: x.astype(jnp.float32), gamma=0.95
        )
        # row [2,2,0,0]: left merges (delta 4); up/down slide only
        board = np.zeros((1, 4, 4), np.int8)
        board[0, 3, 0] = 1
        board[0, 3, 1] = 1
        boards = jnp.asarray(board)
        _, _, legal = engine.peek_all(boards)
        act = int(pol(jax.random.PRNGKey(0), boards, legal)[0])
        assert act == 2  # left (ACTIONS order: up, down, left, right)

    def test_beats_random_with_random_net(self):
        """Even an untrained net's lookahead should dominate the random
        player via the immediate-delta term (smoke-level margin)."""
        pol = self._policy()
        la = players.summarize(players.play_games(
            pol, 48, jax.random.PRNGKey(2), max_steps=400))
        rd = players.summarize(players.play_games(
            players.random_policy, 48, jax.random.PRNGKey(2), max_steps=400))
        assert la["mean_merge_score"] > rd["mean_merge_score"] * 1.2
