"""Evaluation players over the batched env.

Reference: ``Player`` (/root/reference/src/player.py:10-88) plays games
one board at a time on the host; here N games run in lockstep on device
under one jitted ``lax.scan`` — the whole 1000-game baseline run
(player.py:101-106) is a single device program.

Policies:

- ``random_policy`` — uniform over *legal* moves: the reference scores
  ``torch.rand(4) * legality_mask`` and argmaxes (player.py:53-56), which
  is uniform over legal moves.
- ``upleft_policy`` — first legal move in priority order
  up → left → down → right: the batched analogue of the reference's
  up/left loop with down/right fallback (player.py:66-84,
  board.py:244-261). The loop-structured original is also provided
  verbatim-semantics as ``basic_upleft_algorithm`` over the golden board.
- ``greedy_model_policy`` — argmax of legality-masked Q-values.

Documented divergence: the reference evaluates with the ``normalized()``
state encoding (player.py:49) while training uses ``log_scale()``
(dqn_lib.py:8-13) — an inconsistency SURVEY.md §7 resolves by using the
log encoding everywhere; ``encoding='normalized'`` reproduces the literal
reference behavior for comparison.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from t48.env import engine
from t48.env.golden import GoldenBoard


# ---------------------------------------------------------------------------
# Policies: (key, boards, legal, q_context) -> actions int32[B]
# ---------------------------------------------------------------------------


def random_policy(key, boards, legal, _context=None):
    """Uniform over legal moves (player.py:53-56 semantics)."""
    scores = jax.random.uniform(key, legal.shape)
    masked = jnp.where(legal, scores, -1.0)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def upleft_policy(key, boards, legal, _context=None):
    """First legal of up, left, down, right (priority encoding of the
    reference's up-left heuristic, player.py:66-84)."""
    del key
    # priority score per action: up=3, left=2, down=1, right=0
    priority = jnp.array([3.0, 1.0, 2.0, 0.0])  # order: up, down, left, right
    masked = jnp.where(legal, priority, -1.0)
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def greedy_model_policy(apply_fn, params, encode, encoding: str = "log"):
    """Build a greedy policy from a Q-net.

    ``encoding='log'`` uses the training encoding (recommended);
    ``'normalized'`` reproduces the reference's eval-time state/max
    encoding (player.py:49).
    """

    def policy(key, boards, legal, _context=None):
        del key
        b = boards.shape[0]
        flat = boards.reshape(b, -1)
        if encoding == "log":
            x = encode(flat.astype(jnp.int8))
        elif encoding == "normalized":
            vals = jnp.where(flat > 0, jnp.exp2(flat.astype(jnp.float32)), 0.0)
            norm = vals / jnp.maximum(vals.max(-1, keepdims=True), 1.0)
            x = encode(norm)
        else:
            raise ValueError(encoding)
        q = apply_fn(params, x)
        masked = jnp.where(legal, q, -jnp.inf)
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)

    return policy


def lookahead_model_policy(apply_fn, params, encode, gamma: float = 0.95):
    """Depth-1 expectimax over the learned Q (r05 capability demo —
    BEYOND reference parity; the reference evaluates greedy-argmax only,
    player.py:40-64).

    Scores each legal action by the exact Bellman backup the training
    target estimates by sampling (t48/agent/learner.py):

        score(a) = delta_a + gamma * E_spawn[ V(child) ],
        V(s)     = max_a' Q(s, a') over legal a' (0 if terminal),

    where the expectation is computed in closed form over every empty
    cell x {2, 4} spawn of the post-move board (the engine's uniform
    2/4 spawn, board.py:41-51). One device program per step: 4 x 16 x 2
    = 128 child boards per game, batched through the Q-net.
    """
    from t48.env import engine as _eng

    vals = jnp.array([1, 2], jnp.int32)  # spawn exponents for 2 and 4

    def policy(key, boards, legal, _context=None):
        del key
        b, k, _ = boards.shape
        cells = k * k
        moved, deltas, _ = _eng.peek_all(boards)  # [B,4,k,k], [B,4]
        mflat = moved.reshape(b, 4, cells).astype(jnp.int32)
        eye = jnp.eye(cells, dtype=jnp.int32)

        # Children evaluated PER ACTION (static 4-way unroll) instead of
        # one [B,4,C,2,C] tensor: a quarter of the peak live memory —
        # the all-at-once form OOM-crashed the TPU worker at 5000
        # parallel games (~640k child boards per step); per-action the
        # forward still batches B*2C boards, plenty for the MXU.
        evs = []
        for a in range(4):
            ma = mflat[:, a]  # [B, C]
            empty = ma == 0
            n_empty = empty.sum(-1)  # [B]
            children = (
                ma[:, None, None, :]
                + eye[None, :, None, :] * vals[None, None, :, None]
            )  # [B, C, 2, C]
            flat = children.reshape(-1, cells)
            q = apply_fn(params, encode(flat.astype(jnp.int8)))
            child_legal = jnp.stack(
                _eng.legal_cells(_eng.split_cells(
                    flat.reshape(-1, k, k)), k), axis=-1,
            )
            v = jnp.max(
                jnp.where(child_legal, q.astype(jnp.float32), -jnp.inf),
                axis=-1,
            )
            v = jnp.where(child_legal.any(-1), v, 0.0)  # terminal: 0
            v = v.reshape(b, cells, 2)
            w = empty.astype(jnp.float32) / jnp.maximum(
                n_empty[:, None].astype(jnp.float32), 1.0
            )
            evs.append(0.5 * jnp.sum(w[..., None] * v, axis=(1, 2)))
        ev = jnp.stack(evs, axis=-1)  # [B, 4]
        score = deltas.astype(jnp.float32) + gamma * ev
        masked = jnp.where(legal, score, -jnp.inf)
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)

    return policy


# ---------------------------------------------------------------------------
# Batched evaluation
# ---------------------------------------------------------------------------


@struct.dataclass
class GameResults:
    """Per-game outcomes of one batched evaluation run."""

    max_tile: jax.Array  # int32[B]
    merge_score: jax.Array  # int32[B]
    number_moves: jax.Array  # int32[B]
    finished: jax.Array  # bool[B] (False = hit the step cap)


def play_games(
    policy: Callable,
    n_games: int,
    key: jax.Array,
    max_steps: int = 4096,
    k: int = 4,
    p_four: float = 0.5,
    record_history: bool = False,
):
    """Play ``n_games`` games in lockstep until all finish (or cap).

    Finished games freeze (no auto-reset): each env plays exactly one
    game, like the reference's ``play_n_games`` (player.py:31-38).

    Returns ``GameResults`` (and, with ``record_history``, the per-step
    (boards int8[T,B,K*K], actions, rewards, dones) stream for host-side
    history assembly).
    """
    k_init, k_run = jax.random.split(key)

    def body(carry, step_key):
        env, alive = carry
        pre_boards = env.boards

        def policy_fn(k_pol, boards, legal):
            return policy(k_pol, boards, legal), None

        new_env, actions, reward, done_now, legal, _ = engine.env_step(
            env, policy_fn, step_key, p_four
        )
        # freeze finished games: keep their state, don't count steps
        active = alive & ~done_now
        env = engine.EnvState(
            boards=jnp.where(active[:, None, None], new_env.boards, env.boards),
            merge_scores=jnp.where(active, new_env.merge_scores, env.merge_scores),
            step_counts=jnp.where(active, new_env.step_counts, env.step_counts),
        )
        out = None
        if record_history:
            b = actions.shape[0]
            out = (
                pre_boards.reshape(b, -1).astype(jnp.int8),
                actions.astype(jnp.int8),
                reward,
                env.merge_scores,  # cumulative, post-action (player.py:60)
                (~active),
            )
        return (env, active), out

    @jax.jit
    def run(init_key, run_key):
        env = engine.init(init_key, n_games, k, p_four)
        alive = jnp.ones((n_games,), bool)
        keys = jax.random.split(run_key, max_steps)
        (env, alive), history = jax.lax.scan(body, (env, alive), keys)
        results = GameResults(
            max_tile=engine.max_tile(env.boards),
            merge_score=env.merge_scores,
            number_moves=env.step_counts,
            finished=~alive,
        )
        return results, history

    results, history = run(k_init, k_run)
    if record_history:
        return results, history
    return results


def summarize(results: GameResults) -> dict:
    """Max-tile frequency table + aggregate stats (the schema of the
    reference's notebook analysis, experiment_analysis.ipynb cell-5)."""
    max_tiles = np.asarray(jax.device_get(results.max_tile))
    merge_scores = np.asarray(jax.device_get(results.merge_score))
    moves = np.asarray(jax.device_get(results.number_moves))
    tiles, counts = np.unique(max_tiles, return_counts=True)
    return {
        "games": int(max_tiles.shape[0]),
        "max_tile_frequency": {int(t): int(c) for t, c in zip(tiles, counts)},
        "max_tile_percent": {
            int(t): round(100.0 * c / max_tiles.shape[0], 2)
            for t, c in zip(tiles, counts)
        },
        "mean_merge_score": float(merge_scores.mean()),
        "median_merge_score": float(np.median(merge_scores)),
        "best_max_tile": int(max_tiles.max()),
        "mean_moves": float(moves.mean()),
        "unfinished": int((~np.asarray(jax.device_get(results.finished))).sum()),
    }


# ---------------------------------------------------------------------------
# Host-side faithful up-left loop (board.py:244-261 / player.py:66-84)
# ---------------------------------------------------------------------------


def basic_upleft_algorithm(k: int = 4, board: Optional[GoldenBoard] = None):
    """The reference's literal up/left loop with down/right fallback,
    over the golden board. Returns (final_board, history) where history
    entries are (state, action, simple_score, merge_score) —
    player.py:66-84's tuple layout."""
    board = board if board is not None else GoldenBoard(k=k)
    simple_score = board.simple_score()
    history = []
    while True:
        board = board.peek_action("up")
        history.append((board.state, "up", board.simple_score(), board.merge_score()))
        board = board.peek_action("left")
        history.append((board.state, "left", board.simple_score(), board.merge_score()))
        if simple_score == board.simple_score():
            board = board.peek_action("down")
            history.append(
                (board.state, "down", board.simple_score(), board.merge_score())
            )
            board = board.peek_action("right")
            history.append(
                (board.state, "r", board.simple_score(), board.merge_score())
            )
            if simple_score == board.simple_score():
                break
        simple_score = board.simple_score()
    return board, history


# ---------------------------------------------------------------------------
# High-level Player facade
# ---------------------------------------------------------------------------


class Player:
    """Evaluation facade mirroring the reference ``Player``
    (player.py:10-64): plays n games with a policy and persists game
    summaries/histories through an ``Experiment``."""

    def __init__(self, experiment=None, apply_fn=None, params=None, encode=None,
                 encoding: str = "log", lookahead: bool = False,
                 gamma: float = 0.95):
        self.experiment = experiment
        self.lookahead = lookahead
        if apply_fn is not None and lookahead:
            # r05 capability demo: depth-1 expectimax over the learned Q
            self.policy = lookahead_model_policy(
                apply_fn, params, encode, gamma=gamma
            )
        elif apply_fn is not None:
            self.policy = greedy_model_policy(apply_fn, params, encode, encoding)
        else:
            self.policy = None
        self.games_history = []

    def play_n_games(
        self,
        n: int = 1,
        random: bool = False,
        upleft: bool = False,
        seed: int = 0,
        max_steps: int = 4096,
        record_history: bool = False,
        device_batch: int = 0,
    ) -> dict:
        """``device_batch > 0`` splits the run into device programs of at
        most that many parallel games and aggregates (r05): a 5000-game
        LOOKAHEAD program is ~25s of device time in one call, which the
        remote-attached worker does not survive — chunking keeps each
        program short. 0 = all games in one program (the default; fine
        for greedy/random/upleft at any n tried). Not combined with
        ``record_history`` (histories stay single-program)."""
        if upleft:
            policy = upleft_policy
        elif random or self.policy is None:
            policy = random_policy
        else:
            policy = self.policy
        if device_batch and n > device_batch and not record_history:
            parts = []
            done = 0
            while done < n:
                m = min(device_batch, n - done)
                parts.append(play_games(
                    policy, m, jax.random.PRNGKey(seed + 7919 * len(parts)),
                    max_steps=max_steps,
                ))
                done += m
            results = GameResults(
                max_tile=jnp.concatenate([p.max_tile for p in parts]),
                merge_score=jnp.concatenate([p.merge_score for p in parts]),
                number_moves=jnp.concatenate([p.number_moves for p in parts]),
                finished=jnp.concatenate([p.finished for p in parts]),
            )
        else:
            out = play_games(
                policy,
                n,
                jax.random.PRNGKey(seed),
                max_steps=max_steps,
                record_history=record_history,
            )
            if record_history:
                results, history = out
                self._assemble_histories(history)
            else:
                results = out
        stats = summarize(results)
        if self.experiment is not None:
            if record_history:
                self.experiment.save_games_played(self.games_history)
                self.games_history = []
            # lookahead evals persist under their own key so they never
            # clobber the job's committed greedy eval_summary evidence
            key = (
                "eval_summary_lookahead" if self.lookahead
                else "eval_summary"
            )
            self.experiment.add_hyperparameter({key: stats})
            self.experiment.save()
        return stats

    def _assemble_histories(self, history) -> None:
        """History entries are 4-tuples ``(state, action, reward,
        merge_score)`` — the reference ``play_game`` tuple layout
        (player.py:60), with merge_score cumulative after the action."""
        boards, actions, rewards, merge_scores, dones = (
            np.asarray(jax.device_get(x)) for x in history
        )
        t_max, b = actions.shape
        chars = ["u", "d", "l", "r"]
        for g in range(b):
            game = []
            for t in range(t_max):
                exps = boards[t, g].astype(np.int64)
                k = int(np.sqrt(exps.shape[0]))
                values = np.where(exps == 0, 0, 2**exps).reshape(k, k)
                game.append(
                    (
                        values,
                        chars[int(actions[t, g]) % 4],
                        int(rewards[t, g]),
                        int(merge_scores[t, g]),
                    )
                )
                if dones[t, g]:
                    break
            self.games_history.append(game)
