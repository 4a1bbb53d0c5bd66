#!/usr/bin/env python
"""On-device statistical equivalence: Pallas rollout vs XLA engine.

The Pallas kernel's compiled path cannot run under the CPU test suite (the
TPU PRNG has no CPU lowering), so this script validates it on real
hardware: both paths roll out the same number of random-legal steps and
must agree on episode-length and score distributions within tolerance.

Run: python scripts/validate_pallas.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from t48.analysis.bench import make_rollout  # noqa: E402
from t48.env import engine  # noqa: E402
from t48.ops import pallas_step as ps  # noqa: E402


def xla_stats(batch=8192, iters=512):
    env = engine.init(jax.random.PRNGKey(0), batch)
    # count episodes via a scan that tracks dones
    def body(carry, _):
        env, key, episodes, score = carry
        key, k_step, k_reset = jax.random.split(key, 3)

        def pol(k, boards, legal):
            s = jax.random.uniform(k, legal.shape)
            return jnp.argmax(jnp.where(legal, s, -1.0), -1).astype(jnp.int32), None

        env, _, reward, done, _, _ = engine.env_step(env, pol, k_step)
        env = engine.reset_where(env, done, k_reset)
        return (env, key, episodes + done.sum(), score + reward.sum()), None

    @jax.jit
    def run(env, key):
        (env, _, episodes, score), _ = jax.lax.scan(
            body, (env, key, jnp.int32(0), jnp.int32(0)), None, length=iters
        )
        return episodes, score

    episodes, score = run(env, jax.random.PRNGKey(1))
    episodes = int(jax.device_get(episodes))
    score = int(jax.device_get(score))
    return batch * iters / max(episodes, 1), score / max(episodes, 1)


def pallas_stats(batch=8192, iters=512):
    boards = engine.new_boards(jax.random.PRNGKey(0), batch)
    cm = jax.jit(ps.to_cell_major)(boards)
    _, scores, episodes = ps.pallas_rollout(cm, jnp.int32(3), iters=iters)
    ep = int(np.asarray(jax.device_get(episodes)).sum())
    sc = int(np.asarray(jax.device_get(scores)).sum())
    return batch * iters / max(ep, 1), sc / max(ep, 1)


def validate_env_step_kernel(batch=2048):
    """EXACT on-device validation of the single-step training kernel
    (``pallas_env_step``) against the XLA engine: same boards + actions
    must produce identical rewards and legality, spawn exactly one 2/4
    tile in an empty cell of the merged board where the move is legal,
    auto-reset terminal envs to fresh two-tile boards, and emit the
    recomputed legality of the output boards. Randomness differs (TPU
    PRNG vs threefry), so spawn POSITIONS aren't compared — everything
    else is deterministic and compared exactly."""
    key = jax.random.PRNGKey(42)

    @jax.jit
    def warmup(key):
        env = engine.init(key, batch)

        def body(carry, i):
            env = carry
            k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
            acts = jax.random.randint(k1, (batch,), 0, 4)
            env, _, done = engine.step(env, acts, k2)
            env = engine.reset_where(env, done, k3)
            return env, None

        env, _ = jax.lax.scan(body, env, jnp.arange(60))
        return env

    boards = warmup(key).boards
    legal_cm = jax.jit(ps.legal_to_cell_major)(boards)
    cm = jax.jit(ps.to_cell_major)(boards)
    actions = jax.random.randint(jax.random.PRNGKey(7), (batch,), 0, 4)
    new_cm, pre_cm, new_legal_cm, reward = ps.pallas_env_step(
        cm, legal_cm, actions, jnp.int32(123)
    )

    @jax.jit
    def xla_ref(boards, actions):
        cells = engine.split_cells(boards)
        legal_list = engine.legal_cells(cells, 4)
        sel_cells, delta = engine.apply_chosen_cells(cells, actions, 4)
        did = engine._select_lane(legal_list, actions)
        return (
            jnp.stack(legal_list, -1),
            engine.assemble_cells(sel_cells, 4),
            jnp.where(did, delta, 0),
            did,
        )

    legal, merged, exp_reward, did = xla_ref(boards, actions)
    assert np.array_equal(np.asarray(reward), np.asarray(exp_reward))

    pre = np.asarray(jax.device_get(pre_cm)).T.reshape(batch, 16)
    merged_np = np.asarray(merged).reshape(batch, 16)
    did_np = np.asarray(did)
    orig = np.asarray(boards).reshape(batch, 16)
    done_np = ~np.asarray(legal).any(-1)
    new = np.asarray(jax.device_get(new_cm)).T.reshape(batch, 16)
    for i in range(batch):
        if did_np[i]:
            diff = pre[i] - merged_np[i]
            nz = np.nonzero(diff)[0]
            assert len(nz) == 1 and merged_np[i][nz[0]] == 0
            assert pre[i][nz[0]] in (1, 2)
        else:
            assert np.array_equal(pre[i], orig[i])
        if done_np[i]:
            vals = new[i][new[i] > 0]
            assert len(vals) == 2 and set(vals.tolist()) <= {1, 2}
        else:
            assert np.array_equal(new[i], pre[i])

    expect_legal = np.asarray(
        jax.jit(ps.legal_to_cell_major)(
            jnp.asarray(new).reshape(batch, 4, 4)
        )
    )
    assert np.array_equal(np.asarray(new_legal_cm), expect_legal)
    print(f"PASS: pallas_env_step exact-contract validation ({batch} envs)")


def main():
    xla_len, xla_score = xla_stats()
    pal_len, pal_score = pallas_stats()
    print(f"XLA   : mean episode length {xla_len:.1f}, score/episode {xla_score:.0f}")
    print(f"Pallas: mean episode length {pal_len:.1f}, score/episode {pal_score:.0f}")
    len_ratio = pal_len / xla_len
    score_ratio = pal_score / xla_score
    assert 0.9 < len_ratio < 1.1, f"episode length mismatch: ratio {len_ratio:.3f}"
    assert 0.9 < score_ratio < 1.1, f"score mismatch: ratio {score_ratio:.3f}"
    print("PASS: distributions agree within 10%")
    validate_env_step_kernel()


if __name__ == "__main__":
    main()
