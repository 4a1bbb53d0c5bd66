"""Microbenchmark learner-update variants on the live backend.

CAUTION — superseded for decision-making by the IN-LOOP round-robin
measurements in benchmarks/learner_flags_r03.md: the isolated timings
below found bf16/fused/flat each winning 2-4x, but inside the real
training chunk fused and flat LOSE (relayout + ravel/unravel costs the
surrounding program pays). Kept as the op-level instrument; always
confirm flag decisions in-loop.

Times one Double-DQN train_step at the training batch size under several
candidate optimizations, to decide what goes into the real learner:

  base        : current make_train_step (f32, per-leaf Adam, 3 applies)
  flat        : optax.flatten(adam) — one fused vector Adam instead of
                ~8 leaves x ~6 elementwise ops each
  fused       : q(s) and q_online(s') computed in ONE apply on the
                concatenated [2B] batch (same params — pure fusion)
  flat+fused  : both
  bf16        : network compute dtype bfloat16 (params stay f32)
  all         : flat + fused + bf16
"""
import functools
import time

import jax
import jax.numpy as jnp
import optax

from t48.agent import learner as learner_lib
from t48.agent.networks import ConvQNet
from t48.replay import buffer as replay_lib
from t48.train.loop import encoder_for

B = 4096
LR = 1e-4
GAMMA = 0.95


N_INNER = 200  # train steps per jitted call (amortizes ~25ms dispatch+sync)


def make_looped(step, tr):
    """jit: run N_INNER sequential train steps, return final (params-chained)."""

    @jax.jit
    def looped(params, target_params, opt_state):
        def body(carry, _):
            p, o, _ = carry
            out = step(p, target_params, o, tr)
            return (out[0], out[1], out[2]), None

        (p, o, loss), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0)), None, length=N_INNER
        )
        return p, o, loss

    return looped


def timeit(fn, *args, trials=5):
    def sync(out):
        return float(jax.device_get(out[2]))

    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_INNER, out


def make_fused_train_step(apply_fn, encode, optimizer, discount):
    def train_step(params, target_params, opt_state, batch):
        def loss_fn(p):
            enc = encode(batch.state)
            next_enc = encode(batch.next_state)
            both = apply_fn(p, jnp.concatenate([enc, next_enc], axis=0))
            q_all, next_q_online = jnp.split(both, 2, axis=0)
            best_next = jnp.argmax(next_q_online, axis=-1)
            next_q_target = apply_fn(target_params, next_enc)
            sel = lambda q, a: jnp.sum(
                jnp.where(a[:, None] == jnp.arange(4)[None, :], q, 0.0), -1
            )
            not_done = 1.0 - batch.done.astype(jnp.float32)
            y = jax.lax.stop_gradient(
                batch.reward + not_done * discount * sel(next_q_target, best_next)
            )
            return jnp.sum(jnp.square(sel(q_all, batch.action) - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return train_step


def main():
    key = jax.random.PRNGKey(0)
    encode = encoder_for("conv", 4)
    tr = replay_lib.Transition(
        state=jax.random.randint(key, (B, 16), 0, 11).astype(jnp.int8),
        action=jax.random.randint(key, (B,), 0, 4),
        reward=jax.random.uniform(key, (B,)) * 100,
        next_state=jax.random.randint(key, (B, 16), 0, 11).astype(jnp.int8),
        done=jax.random.uniform(key, (B,)) < 0.01,
    )
    results = {}
    for name in ["base", "flat", "fused", "flat+fused", "bf16", "all"]:
        dtype = jnp.bfloat16 if ("bf16" in name or name == "all") else jnp.float32
        net = ConvQNet(dtype=dtype)
        params = net.init(jax.random.PRNGKey(1), encode(tr.state[:1]))
        opt = optax.adam(LR)
        if "flat" in name or name == "all":
            opt = optax.flatten(opt)
        opt_state = opt.init(params)
        if "fused" in name or name == "all":
            step = make_fused_train_step(net.apply, encode, opt, GAMMA)
        else:
            raw = learner_lib.make_train_step(net.apply, encode, opt, GAMMA)
            step = lambda p, t, o, b, _s=raw: tuple(_s(p, t, o, b))
        looped = make_looped(step, tr)
        best, out = timeit(looped, params, params, opt_state)
        loss = float(out[2])
        results[name] = (best, loss)
        print(f"{name:12s} {best*1e6:9.1f} us/update   loss={loss:.2f}", flush=True)
    base = results["base"][0]
    for name, (t, _) in results.items():
        print(f"{name:12s} speedup {base/t:.2f}x")


if __name__ == "__main__":
    main()
