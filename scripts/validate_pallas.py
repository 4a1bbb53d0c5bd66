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


if __name__ == "__main__":
    main()
