"""Does scan unroll amortize the per-trip floor for the real learner body?"""
import time, jax, jax.numpy as jnp, optax
from t48.agent import learner as learner_lib
from t48.agent.networks import build_network
from t48.replay import buffer as replay_lib

B = 4096
ITERS = 256
enc2d = lambda f: f.astype(jnp.float32).reshape(f.shape[0], 4, 4, 1)


def timeit(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.4f}s/{ITERS} = {best/ITERS*1e6:.1f} us/logical-iter",
          flush=True)


net = build_network("conv")
x = jnp.zeros((B, 16), jnp.int8)
params = net.init(jax.random.PRNGKey(0), enc2d(x))
opt = optax.adam(1e-2)
rs = replay_lib.create(4 * B, 16, B)
key = jax.random.PRNGKey(1)
tr = replay_lib.Transition(
    state=jax.random.randint(key, (B, 16), 0, 8).astype(jnp.int8),
    action=jax.random.randint(key, (B,), 0, 4).astype(jnp.int32),
    reward=jax.random.uniform(key, (B,)) * 8,
    next_state=jax.random.randint(key, (B, 16), 0, 8).astype(jnp.int8),
    done=jnp.zeros((B,), bool))
for _ in range(4):
    rs = replay_lib.add_step(rs, tr)
step = learner_lib.make_train_step(net.apply, enc2d, opt, 0.8, True)


def make(unroll):
    def body(carry, _):
        p, tp, o, rng = carry
        rng, k = jax.random.split(rng)
        sampled = replay_lib.sample(rs, k, 5000)
        out = step(p, tp, o, sampled)
        return (out.params, tp, out.opt_state, rng), None

    @jax.jit
    def many(params, tp, o, rng):
        (p, *_), _ = jax.lax.scan(body, (params, tp, o, rng), None,
                                  length=ITERS, unroll=unroll)
        return p
    return many


args = (params, params, opt.init(params), jax.random.PRNGKey(2))
for u in (1, 4, 16):
    timeit(f"full_unroll{u}", make(u), *args)
