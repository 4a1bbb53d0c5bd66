"""Compare conv-as-conv vs conv-as-matmul in the scan'd learner context."""
import time, jax, jax.numpy as jnp, optax
from flax import linen as nn
from t48.agent import learner as learner_lib
from t48.agent.networks import build_network
from t48.replay import buffer as replay_lib

B = 4096
ITERS = 256

class ConvAsMatmul(nn.Module):
    """ConvQNet expressed as patch-gather + dense matmuls (no conv ops)."""
    dtype: jnp.dtype = jnp.float32
    @nn.compact
    def __call__(self, x):  # x: [B, 4, 4, 1]
        x = x.astype(self.dtype)
        b = x.shape[0]
        # conv1: 2x2 valid over 4x4x1 -> 3x3x64
        p = jnp.stack([x[:, i:i+3, j:j+3, 0] for i in range(2) for j in range(2)], -1)  # [B,3,3,4]
        h = nn.Dense(64, dtype=self.dtype)(p.reshape(b, 9, 4))
        h = nn.relu(h).reshape(b, 3, 3, 64)
        # conv2: 2x2 valid over 3x3x64 -> 2x2x64
        p2 = jnp.concatenate([h[:, i:i+2, j:j+2, :] for i in range(2) for j in range(2)], -1)  # [B,2,2,256]
        h2 = nn.relu(nn.Dense(64, dtype=self.dtype)(p2.reshape(b, 4, 256)))
        h3 = nn.relu(nn.Dense(64, dtype=self.dtype)(h2.reshape(b, 256)))
        return nn.Dense(4, dtype=self.dtype)(h3)

def bench(name, net, encode):
    x = jnp.zeros((B, 16), jnp.int8)
    params = net.init(jax.random.PRNGKey(0), encode(x))
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
    step = learner_lib.make_train_step(net.apply, encode, opt, 0.8, True)
    def body(carry, _):
        p, tp, o, rng = carry
        rng, k = jax.random.split(rng)
        sampled = replay_lib.sample(rs, k, 5000)
        out = step(p, tp, o, sampled)
        return (out.params, tp, out.opt_state, rng), None
    @jax.jit
    def many(params, tp, o, rng):
        (p, *_), _ = jax.lax.scan(body, (params, tp, o, rng), None, length=ITERS)
        return p
    args = (params, params, opt.init(params), jax.random.PRNGKey(2))
    r = many(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = many(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.4f}s/256 = {best/ITERS*1e6:.1f} us/update", flush=True)

enc2d = lambda f: f.astype(jnp.float32).reshape(f.shape[0], 4, 4, 1)
bench("conv_flax", build_network("conv"), enc2d)
bench("conv_matmul", ConvAsMatmul(), enc2d)
