"""Is the floor per-iteration or per-kernel? Chain N dependent matmuls."""
import time, jax, jax.numpy as jnp

ITERS = 256


def timeit(name, fn, *args):
    r = fn(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.4f}s/{ITERS} = {best/ITERS*1e6:.1f} us/iter", flush=True)


def chain(n_mm, n=512):
    a = [jnp.eye(n, dtype=jnp.float32) * (1.0 + i * 1e-6) for i in range(n_mm)]
    @jax.jit
    def run(x):
        def body(c, _):
            for m in a:
                c = c @ m
            return c * 0.9999, None
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out
    timeit(f"chain{n_mm}x{n}", run, jnp.ones((n, n), jnp.float32))


chain(1)
chain(2)
chain(4)
chain(8)
chain(16)

# same but tiny matmuls (64x64) — launch-bound if floor per kernel
chain(1, 64)
chain(8, 64)
chain(16, 64)
