"""Where do 438us/update go? Ablate the learner update stage by stage."""
import time, functools, jax, jax.numpy as jnp, optax
from t48.agent import learner as learner_lib
from t48.agent.networks import build_network, ConvQNet
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
    print(f"{name}: {best:.4f}s/{ITERS} = {best/ITERS*1e6:.1f} us/iter", flush=True)


def make_setup(net, encode):
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
    return params, opt, rs


def scan_bench(name, net, encode, mode):
    params, opt, rs = make_setup(net, encode)
    step = learner_lib.make_train_step(net.apply, encode, opt, 0.8, True)

    def body(carry, _):
        p, tp, o, rng, acc = carry
        rng, k = jax.random.split(rng)
        sampled = replay_lib.sample(rs, k, 5000)
        if mode == "full":
            out = step(p, tp, o, sampled)
            return (out.params, tp, out.opt_state, rng, acc + out.loss), None
        if mode == "sample_only":
            acc = acc + sampled.reward.sum()
            return (p, tp, o, rng, acc), None
        if mode == "fwd3":  # 3 forwards, no grad
            ns = encode(sampled.next_state)
            q1 = net.apply(p, ns)
            q2 = net.apply(tp, ns)
            q3 = net.apply(p, encode(sampled.state))
            acc = acc + q1.sum() + q2.sum() + q3.sum()
            return (p, tp, o, rng, acc), None
        if mode == "loss_grad":  # value_and_grad but no optimizer
            loss, grads = jax.value_and_grad(
                lambda pp: learner_lib.td_loss(
                    net.apply, pp, tp, encode, sampled, 0.8, True))(p)
            # consume grads cheaply so they aren't DCE'd
            g = jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum(), grads, jnp.float32(0))
            return (p, tp, o, rng, acc + loss + g), None
        raise ValueError(mode)

    @jax.jit
    def many(params, tp, o, rng):
        (p, _, _, _, acc), _ = jax.lax.scan(
            body, (params, tp, o, rng, jnp.float32(0)), None, length=ITERS)
        return acc
    args = (params, params, opt.init(params), jax.random.PRNGKey(2))
    timeit(name, many, *args)


net_f32 = build_network("conv")
net_bf16 = ConvQNet(dtype=jnp.bfloat16)
scan_bench("sample_only", net_f32, enc2d, "sample_only")
scan_bench("fwd3_f32", net_f32, enc2d, "fwd3")
scan_bench("fwd3_bf16", net_bf16, enc2d, "fwd3")
scan_bench("loss_grad_f32", net_f32, enc2d, "loss_grad")
scan_bench("loss_grad_bf16", net_bf16, enc2d, "loss_grad")
scan_bench("full_f32", net_f32, enc2d, "full")
scan_bench("full_bf16", net_bf16, enc2d, "full")
