"""HBM-resident replay buffer: one sub-ring per environment, cell-major.

The reference keeps a host-side ``collections.deque`` of *Board objects*
and tensorizes every sampled experience on every train step — two
host→device transfers per sampled item (dqn_lib.py:106, 33-64). This
module inverts that: transitions are encoded **once at insert** into a
fixed-size device array that lives in HBM for the whole run.

Storage layout (B = env batch, M = per-env capacity, S = K*K cells):

  rows      : bf16[2S+5, M, B] — component-major, batch-MINOR:
              [0:S) state exponents, [S:2S) next_state exponents,
              [2S] action, [2S+1] done, [2S+2:2S+5) the reward as an
              exact bf16 triple (see below)
  ptr, fill : int32 — per-env write head / live count (scalar: envs
              insert in lockstep, so every row has the same head)

Why batch-minor (cell-major): the minor-most dim maps to the TPU's 128
vector lanes. The whole training hot loop carries boards as
``int32[16, B]`` (t48/train/loop.py) — storing replay rows with B minor
means insert, sampling AND the learner's network input all stay in one
orientation with ZERO transposes/relayouts per iteration (the previous
[B, M, R] layout paid two full relayouts per env step). Ops:

- **insert** is ONE fused elementwise select over the whole buffer
  (``where(slot == head, new, rows)``) — a streaming VPU rewrite;
- **sampling** is a lane-parallel one-hot contraction over the tiny M
  axis (``einsum('smb,rmb->rsb')``), every lane an independent env.

Both are bit-exact. Board exponents (≤ ~60), actions and done flags are
small integers, exact in bf16. The f32 reward is stored as the classic
bf16-triple decomposition r = h1 + h2 + h3 (each h_i the bf16 rounding
of the remaining residual): three nearest-roundings leave residual
spans of ≤15 and ≤6 mantissa bits, so the triple reconstructs every
normal f32 exactly.

Why a trailing env axis: it is exactly the ``data`` mesh axis
(P(None, None, 'data')). Inserts and per-env sampling are elementwise/
batched in that axis, so each device touches only its own envs' shard
with **zero cross-device traffic**; the learner's gradient psum is the
only collective in the train step (asserted on the HLO in
tests/test_sharding.py).

Sampling is **stratified per env**: each env contributes
``sample_rows(batch_size, B)`` uniform-with-replacement draws from its
own ring. All rows always have the same fill, so stratified sampling
has the same marginal distribution as the reference's global uniform
``np.random.randint`` (dqn_lib.py:67-70) — the variance-reduced
estimator of the same expectation, and *exactly* the reference scheme
at env_batch=1.

Documented divergences (both exact at env_batch=1):
- effective capacity rounds up to ``B * ceil(N / B)``;
- effective sample batch rounds to ``B * max(1, round(batch/B))``, and
  with ``cap=True`` (the trainer's default) is then masked back down to
  exactly ``batch_size`` contributing rows whenever the rounding would
  exceed it — so the configured batch size holds at any env_batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_EXTRA_COLS = 5  # action, done, reward triple


class Transition(NamedTuple):
    """A batch of transitions, batch-major (external/cold-path form:
    A*-seeded warm starts, tests). The hot path uses ``CMTransition``.

    ``weight`` is an optional per-row f32 loss weight attached by the
    capped sampler (0 masks a surplus row, 1 keeps it); it is never
    stored in the buffer — inserts leave it None.
    """

    state: jax.Array  # int8[B, S]
    action: jax.Array  # int8/int32[B]
    reward: jax.Array  # f32[B]
    next_state: jax.Array  # int8[B, S]
    done: jax.Array  # bool[B]
    weight: object = None  # optional f32[B] loss weight (capped sampling)


class CMTransition(NamedTuple):
    """A batch of transitions, cell-major (the hot-path form): boards
    ``[S, B]`` with batch minor. ``state``/``next_state`` may be any
    int/float dtype holding exact exponents; sampled batches come back
    f32 (exact integer contents)."""

    state: jax.Array  # [S, B] exponents
    action: jax.Array  # int32[B]
    reward: jax.Array  # f32[B]
    next_state: jax.Array  # [S, B] exponents
    done: jax.Array  # bool[B]
    weight: object = None  # optional f32[B] loss weight (capped sampling)


def to_cm(t: Transition) -> CMTransition:
    """Batch-major → cell-major (cold paths: seeding, tests)."""
    return CMTransition(
        state=t.state.T,
        action=t.action,
        reward=t.reward,
        next_state=t.next_state.T,
        done=t.done,
        weight=t.weight,
    )


def _bf16_triple(x: jax.Array):
    """Exact decomposition f32 → (h1, h2, h3) bf16 with x == (h1+h2)+h3.

    Each step rounds the residual to nearest-bf16 and subtracts (the
    subtraction is exact in f32 because it cancels the leading bits).
    After two extractions the residual spans ≤6 mantissa bits, within
    bf16's 8 — so the triple is exact for every normal f32, and the
    f32 reconstruction (h1+h2)+h3 re-sums without rounding (bit spans
    of 18 and 24 ≤ f32's 24).
    """
    x = x.astype(jnp.float32)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    return h1, h2, h3


def _encode_rows(batch: CMTransition) -> jax.Array:
    """Pack a cell-major transition batch into bf16 [2S+5, B]."""
    h1, h2, h3 = _bf16_triple(batch.reward)
    row = lambda v: v.astype(jnp.bfloat16)[None, :]  # noqa: E731
    return jnp.concatenate(
        [
            batch.state.astype(jnp.bfloat16),
            batch.next_state.astype(jnp.bfloat16),
            row(batch.action),
            row(batch.done),
            row(h1),
            row(h2),
            row(h3),
        ],
        axis=0,
    )


def _decode_rows(flat: jax.Array) -> CMTransition:
    """Unpack f32 [2S+5, *batch] (exact-integer contents) → CMTransition.

    Any number of trailing batch dims — sampled batches come back
    [2S+5, s, B] (draws × envs, unflattened; see ``sample``)."""
    s = (flat.shape[0] - _EXTRA_COLS) // 2
    return CMTransition(
        state=flat[:s],
        action=flat[2 * s].astype(jnp.int32),
        reward=(flat[2 * s + 2] + flat[2 * s + 3]) + flat[2 * s + 4],
        next_state=flat[s : 2 * s],
        done=flat[2 * s + 1] != 0,
    )


@struct.dataclass
class ReplayState:
    rows: jax.Array  # bf16[2S+5, M, B] packed transitions, batch minor
    ptr: jax.Array  # int32 scalar: per-env write head
    fill: jax.Array  # int32 scalar: per-env live count

    @property
    def env_batch(self) -> int:
        return self.rows.shape[2]

    @property
    def per_env_capacity(self) -> int:
        return self.rows.shape[1]

    @property
    def capacity(self) -> int:
        """Total transition capacity across all env rings."""
        return self.rows.shape[1] * self.rows.shape[2]

    @property
    def total_fill(self):
        """Total live transitions (fill is per-env)."""
        return self.fill * self.rows.shape[2]

    @property
    def cells(self) -> int:
        return (self.rows.shape[0] - _EXTRA_COLS) // 2

    # Decoded full-buffer views in the ORIGINAL batch-major orientation
    # ([B, M, ...]) — host/test convenience, not the hot path.
    def _view(self, field: str):
        r, m, b = self.rows.shape
        flat = self.rows.reshape(r, m * b).astype(jnp.float32)
        dec = getattr(_decode_rows(flat), field)
        if field in ("state", "next_state"):
            out = dec.reshape(self.cells, m, b).transpose(2, 1, 0)
            return out.astype(jnp.int8)
        return dec.reshape(m, b).T

    @property
    def state(self):
        return self._view("state")

    @property
    def action(self):
        return self._view("action")

    @property
    def reward(self):
        return self._view("reward")

    @property
    def next_state(self):
        return self._view("next_state")

    @property
    def done(self):
        return self._view("done")


def per_env_capacity(capacity: int, env_batch: int) -> int:
    """ceil(capacity / env_batch) — the per-env ring length M."""
    return max(1, -(-capacity // env_batch))


def sample_rows(batch_size: int, env_batch: int) -> int:
    """Per-env draws per sample: ``max(1, round(batch_size / env_batch))``.

    The raw sample is ``env_batch * sample_rows`` rows (equal to
    ``batch_size`` whenever it divides evenly — always at env_batch=1);
    ``sample(cap=True)`` masks it back down to ``batch_size``.
    """
    return max(1, round(batch_size / env_batch))


def create(capacity: int, cells: int = 16, env_batch: int = 1) -> ReplayState:
    """Allocate an empty buffer of ≥``capacity`` transitions, split into
    ``env_batch`` per-env rings."""
    m = per_env_capacity(capacity, env_batch)
    return ReplayState(
        rows=jnp.zeros((2 * cells + _EXTRA_COLS, m, env_batch), jnp.bfloat16),
        ptr=jnp.zeros((), jnp.int32),
        fill=jnp.zeros((), jnp.int32),
    )


def add_step(rs: ReplayState, batch) -> ReplayState:
    """Append one transition per env (B lockstep ``append`` calls,
    dqn_lib.py:106). One fused elementwise select over the buffer — no
    dynamic-update-slice (row-serial on TPU), shard-local under a 'data'
    mesh. Evict-oldest falls out of the modular head per ring.

    Accepts a ``CMTransition`` (hot path) or a batch-major ``Transition``
    (cold paths; converted)."""
    if isinstance(batch, Transition):
        batch = to_cm(batch)
    m = rs.per_env_capacity
    p = rs.ptr % m
    sel = (jnp.arange(m) == p)[None, :, None]
    return rs.replace(
        rows=jnp.where(sel, _encode_rows(batch)[:, None, :], rs.rows),
        ptr=(p + 1) % m,
        fill=jnp.minimum(rs.fill + 1, m),
    )


def add_many(rs: ReplayState, transitions: Transition) -> ReplayState:
    """Bulk-insert T arbitrary batch-major transitions (the A*-seeded
    warm start, reference double_dqn_conv_sss.py:65). Host-side helper:
    pads T up to a multiple of B by cycling from the start (documented
    divergence — the warm start is a heuristic seed, duplicates are
    harmless under with-replacement sampling), then writes ceil(T/B)
    lockstep steps."""
    t = int(np.shape(transitions.action)[0])
    b = rs.env_batch
    steps = -(-t // b)
    pad = steps * b - t

    def pad_cycle(x):
        x = np.asarray(x)
        if pad:
            reps = -(-pad // t)
            x = np.concatenate([x, np.tile(x, (reps,) + (1,) * (x.ndim - 1))[:pad]])
        return x.reshape((steps, b) + x.shape[1:])

    stored = transitions[:5]  # weight is never stored
    rows = Transition(*(pad_cycle(x) for x in stored))
    for i in range(steps):
        rs = add_step(rs, to_cm(Transition(*(x[i] for x in rows[:5]))))
    return rs


def sample(
    rs: ReplayState, key: jax.Array, batch_size: int, cap: bool = False
) -> CMTransition:
    """Stratified uniform sampling with replacement: each env ring
    contributes ``sample_rows(batch_size, B)`` draws from its own live
    region (see module docstring for why this matches the reference's
    global uniform scheme, dqn_lib.py:67-70). The draw is a lane-parallel
    one-hot contraction over the tiny ring axis (f32 accumulation,
    bit-exact) — per-env, aligned with the 'data' shard axis, no
    cross-device traffic. Returns a cell-major batch of N = B·s rows,
    flattened in (draw, env) order.

    The training loop may call this speculatively every iteration, even
    on an empty buffer: ``max(fill, 1)`` plus the zero-initialized rows
    make the degenerate draw benign (the loop's select-merge discards
    the resulting update).

    ``cap=True``: when the stratified draw exceeds ``batch_size`` rows
    (env_batch > batch_size forces ≥1 draw/env), attach a 0/1 ``weight``
    masking a uniformly-rotated subset down to EXACTLY ``batch_size``
    contributing rows, so the effective learner batch no longer silently
    inflates with the parallelism degree. The rotation offset is uniform,
    giving every env equal marginal inclusion probability; the mask is
    computed from an iota — still shard-local, no gather.
    """
    r, m, b = rs.rows.shape
    s = sample_rows(batch_size, b)
    k_idx, k_off = jax.random.split(key)
    idx = jax.random.randint(k_idx, (s, b), 0, jnp.maximum(rs.fill, 1))
    onehot = (idx[:, None, :] == jnp.arange(m)[None, :, None]).astype(
        jnp.bfloat16
    )
    # Output keeps the [r, s, b] factored batch shape — flattening (s, b)
    # would merge the sharded minor env axis into a strided dimension
    # GSPMD cannot express, forcing an all-gather of the sampled batch
    # (it did: caught by tests/test_sharding.py's HLO assertion). The
    # learner treats all trailing dims as batch, so no flatten is needed.
    flat = jnp.einsum(
        "smb,rmb->rsb",
        onehot,
        rs.rows,
        preferred_element_type=jnp.float32,
    )
    out = _decode_rows(flat)
    n = s * b
    if cap and n > batch_size:
        offset = jax.random.randint(k_off, (), 0, n)
        include = (
            (jnp.arange(n).reshape(s, b) + offset) % n
        ) < batch_size
        out = out._replace(weight=include.astype(jnp.float32))
    return out
