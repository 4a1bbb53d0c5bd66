"""Calibrate the per-scan-iteration floor on this TPU backend."""
import time, jax, jax.numpy as jnp

ITERS = 256


def timeit(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.4f}s/{ITERS} = {best/ITERS*1e6:.1f} us/iter", flush=True)


@jax.jit
def empty_scan(x):
    def body(c, _):
        return c + 1.0, None
    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return out
timeit("empty", empty_scan, jnp.float32(0))


@jax.jit
def rng_scan(key):
    def body(k, _):
        k, s = jax.random.split(k)
        return k, None
    out, _ = jax.lax.scan(body, key, None, length=ITERS)
    return out
timeit("rng_split", rng_scan, jax.random.PRNGKey(0))


def matmul_scan(n):
    a = jnp.ones((n, n), jnp.float32)
    @jax.jit
    def run(x):
        def body(c, _):
            return jnp.tanh(c @ a), None
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out
    timeit(f"matmul{n}", run, jnp.ones((n, n), jnp.float32))
matmul_scan(512)
matmul_scan(2048)


# many small fusions per iteration: does kernel count set the floor?
def smallops_scan(n_ops):
    @jax.jit
    def run(x):
        def body(c, _):
            vs = []
            for i in range(n_ops):
                # distinct non-fusable-together ops: gather with its own idx
                vs.append(jnp.roll(c, i + 1) * (i + 1.0))
            acc = c
            for v in vs:
                acc = acc + v
            return acc / (n_ops + 1.0), None
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out
    timeit(f"smallops{n_ops}", run, jnp.ones((4096,), jnp.float32))
smallops_scan(8)
smallops_scan(64)


# big carry: does carry size set the floor?
def carry_scan(mb):
    n = mb * 1024 * 1024 // 4
    @jax.jit
    def run(x):
        def body(c, _):
            return c.at[0].add(1.0), None
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out
    timeit(f"carry{mb}MB", run, jnp.ones((n,), jnp.float32))
carry_scan(1)
carry_scan(64)
