"""On-device batched actor-learner training loop.

TPU-first redesign of the reference ``training_loop``
(/root/reference/src/dqn_lib.py:167-244). The reference steps ONE board on
the host, crossing the host↔device boundary per tensor; here B environments
step in lockstep inside a single jitted ``lax.scan`` chunk — env, policy
forward, replay writes, learner updates and target syncs all stay resident
on device. The host only drains a small episode-metrics ring between
chunks.

Cadence semantics are preserved against *completed-episode counts*
(SURVEY.md §7.5): with ``env_batch == 1`` the schedule is step-for-step the
reference's —

- ε decays linearly per episode (dqn_lib.py:184-188);
- the learner fires once per completed episode after
  ``no_episodes_before_training`` (dqn_lib.py:213-226);
- the target net hard-syncs each time the episode count crosses a multiple
  of ``no_episodes_before_updating_target`` (dqn_lib.py:227-228);
- each episode logs {max_tile, merge_score, number, mean reward, mean Q,
  ε, number_moves} (experiments.py:112-122, dqn_lib.py:204-207).

With ``env_batch == B`` the same rules apply to the global episode counter;
multiple episodes may complete per iteration. Learner updates are
deficit-driven: each update consumes one owed completed episode and up to
``config.max_updates_per_iteration`` updates run per iteration, so with
max_updates ≥ B/mean_episode_len the reference's one-update-per-episode
cadence holds exactly at any batch (unconsumed episodes carry over); with
fewer, the update:episode ratio is max_updates·mean_episode_len/B
(documented divergence, a tunable compute/fidelity knob).

Documented divergence — episode numbering: the reference numbers episodes
by *start* order (the loop index, dqn_lib.py:174); here an episode's
``number`` is its *completion* rank (ties within one iteration broken by
env index). At env_batch=1 the two coincide; at env_batch=B a long game
gets a later number than a short game started after it. All schedules and
metrics key off completed-episode counts, so curves remain comparable.

Env 0 is the *snapshot env*: its per-step (board, action, reward, done)
stream is emitted from the scan so the host can reconstruct full game
histories for the reference's ``snapshot_game`` playback artifacts
(experiments.py:124-126).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from t48.agent import learner as learner_lib
from t48.agent import networks, policy as policy_lib
from t48.configs.presets import T48Config
from t48.env import engine
from t48.replay import buffer as replay_lib
from t48.train.schedules import epsilon_schedule


@struct.dataclass
class EpisodeLog:
    """Per-env on-device buffer of completed-episode metrics.

    ``data[c, i, b]`` is column *c* of env *b*'s *i*-th completion since
    the last drain — packed int32 columns (max_tile, merge_score, number,
    reward_bits, q_value_bits, epsilon_bits, number_moves), the three
    float metrics bitcast to int32. ``count[b]`` is env *b*'s completions
    since the drain; ``make_train_chunk`` zeroes it at every chunk entry
    and the host drains after every chunk, sorting rows by the global
    completion rank stored in the ``number`` column.

    Why per-env slots instead of one global ring: a global ring needs a
    scatter at batch-computed slots, and TPU scatters are row-serialized
    (~180µs/iteration at env_batch=4096 — it was 22% of the training
    iteration, benchmarks/breakdown_r02_pre.json). The per-env write is
    a fused elementwise select (``where(slot == count_b and done_b)``).
    Layout is batch-MINOR ([7, R, B]) like the rest of the hot loop —
    every write is lane-parallel over B.
    """

    data: jax.Array  # int32[7, R, B] packed metric columns, batch minor
    count: jax.Array  # int32[B] completions since last drain


# packed column order (shared by the writer below and the host drain)
_LOG_COLS = ("max_tile", "merge_score", "number", "reward", "q_value",
             "epsilon", "number_moves")
_LOG_FLOAT_COLS = (3, 4, 5)  # reward, q_value, epsilon — bitcast f32
_LOG_NUMBER_COL = 2


def effective_log_size(config: T48Config) -> int:
    """Per-env episode-slot capacity R that provably cannot overflow
    within a chunk.

    A 2048 episode lasts at least K²−2 env steps: a fresh board holds 2
    tiles, the game can only end with the board full (any empty cell
    admits a legal slide), each step spawns at most one tile and merges
    only remove tiles — so ≥ K²−2 spawning steps must pass before a board
    can fill. Per chunk each env therefore completes at most
    ``1 + (chunk_iters−1) // (K²−2)`` episodes (the +1 covers an episode
    already in flight at the chunk boundary). Sizing each env's slots to
    that bound makes the drain's drop path an impossible state;
    ``config.episode_log_size`` (a *global* entry count, divided by
    env_batch) only ever raises the capacity.
    """
    min_episode_steps = config.board_k * config.board_k - 2
    bound = 1 + (config.chunk_iters - 1) // min_episode_steps
    return max(bound, -(-config.episode_log_size // config.env_batch))


def _create_log(size: int, env_batch: int) -> EpisodeLog:
    return EpisodeLog(
        data=jnp.zeros((len(_LOG_COLS), size, env_batch), jnp.int32),
        count=jnp.zeros((env_batch,), jnp.int32),
    )


@struct.dataclass
class TrainState:
    """Everything the run needs, as one device-resident pytree.

    This is also the checkpoint payload: params, target params, optimizer
    state, env state, per-env episode accumulators, replay buffer, RNG key
    and all counters — full-fidelity resume by construction (the
    reference's resume restores only the model, experiments.py:51-65;
    SURVEY.md §3.4 recommends exactly this superset).
    """

    params: object
    target_params: object
    opt_state: object
    env: engine.EnvState
    ep_reward_sum: jax.Array  # f32[B]
    ep_q_sum: jax.Array  # f32[B]
    replay: replay_lib.ReplayState
    rng: jax.Array
    episodes_done: jax.Array  # int32
    env_steps: jax.Array  # int64-ish int32; total env steps taken
    train_steps: jax.Array  # int32 learner updates applied
    last_train_episodes: jax.Array  # int32
    last_sync_episodes: jax.Array  # int32
    last_loss: jax.Array  # f32
    log: EpisodeLog


class SnapshotStream(NamedTuple):
    """Per-iteration record of the snapshot env (env 0)."""

    board: jax.Array  # int8[T, K*K] pre-action exponents
    action: jax.Array  # int8[T]
    reward: jax.Array  # int32[T]
    done: jax.Array  # bool[T]


@struct.dataclass
class CMEnvState:
    """Cell-major env carry for the Pallas in-loop step: boards as
    int32[16, B] (cells in sublanes, batch in lanes — the kernel's VMEM
    layout) plus the CARRIED legality of those boards (computed by the
    previous kernel call, consumed by this iteration's policy). Exists
    only inside a train chunk; checkpoints and the public TrainState
    carry the batch-major ``engine.EnvState``."""

    boards_cm: jax.Array  # int32[16, B]
    legal_cm: jax.Array  # int32[4, B] 0/1
    merge_scores: jax.Array  # int32[B]
    step_counts: jax.Array  # int32[B]


def _to_cm_env(env: engine.EnvState) -> CMEnvState:
    from t48.ops import pallas_step as ps

    return CMEnvState(
        boards_cm=ps.to_cell_major(env.boards),
        legal_cm=ps.legal_to_cell_major(env.boards),
        merge_scores=env.merge_scores,
        step_counts=env.step_counts,
    )


def _from_cm_env(cme: CMEnvState, k: int) -> engine.EnvState:
    return engine.EnvState(
        boards=cme.boards_cm.T.reshape(-1, k, k),
        merge_scores=cme.merge_scores,
        step_counts=cme.step_counts,
    )


def resolve_env_backend(config: T48Config, mesh=None) -> str:
    """Trace-time choice of the in-loop env step implementation.

    'auto' → the fused Pallas kernel iff running on TPU with k=4 and a
    per-shard batch of at least 256 envs; the XLA cell-major engine
    otherwise (CPU tests, the virtual-device dry run, tiny batches).

    The r04 constraint additionally required per-shard % 1024 == 0 (the
    kernel's block size), which silently demoted the exact-batch b2560
    flagship — the round's headline config — to the XLA env (VERDICT r04
    weak #3). ``pallas_env_step`` now pads odd batches to the block
    internally, so the only remaining gate is a size floor: below ~256
    envs the padded block is mostly wasted lanes and such configs
    (env_batch=1 reference-cadence runs) gain nothing from the kernel.
    """
    if config.env_backend != "auto":
        return config.env_backend
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    n_shards = 1 if mesh is None else int(np_prod_mesh(mesh))
    per_shard = config.env_batch // max(n_shards, 1)
    ok = (
        on_tpu
        and config.board_k == 4
        and config.env_batch % max(n_shards, 1) == 0
        and per_shard >= 256
    )
    return "pallas" if ok else "xla"


def np_prod_mesh(mesh) -> int:
    return int(mesh.shape.get("data", 1))


def encoder_for(arch: str, k: int) -> Callable:
    """Encoder from *flat int8 exponent* storage to network input."""
    if arch.startswith("dense"):
        return lambda flat: flat.astype(jnp.float32)
    if arch.startswith("conv"):
        return lambda flat: flat.astype(jnp.float32).reshape(
            flat.shape[0], k, k, 1
        )
    raise ValueError(arch)


def build_net(config: T48Config):
    """The config's Q-network (compute dtype per ``config.compute_dtype``;
    params stay f32)."""
    return networks.build_network(
        config.arch, networks.dtype_of(config.compute_dtype)
    )


def build_optimizer(config: T48Config) -> optax.GradientTransformation:
    """The config's optimizer. ``learner_flat_adam`` wraps Adam in
    ``optax.flatten``: moments live in ONE flat vector, so the update is
    a single fused elementwise pass instead of ~8 leaves × ~6 ops each
    (measured ~1.3× on the update, scripts/learner_microbench.py).

    ``lr_schedule != 'constant'`` (r05, documented divergence) builds
    Adam on an optax schedule: full lr for ``lr_decay_start`` updates,
    then cosine/linear decay to ``learning_rate * lr_final_scale`` over
    ``lr_decay_steps``. The scheduled optimizer carries an extra count
    leaf in opt_state, so a staged run that widens mid-job must use the
    SAME schedule mode in both phases (the constant region makes the
    early phase numerically identical to constant-lr)."""
    if config.lr_schedule == "constant":
        opt = optax.adam(config.learning_rate)
    else:
        lr, scale = config.learning_rate, config.lr_final_scale
        if config.lr_schedule == "cosine":
            decay = optax.cosine_decay_schedule(
                lr, max(config.lr_decay_steps, 1), alpha=scale
            )
        else:
            decay = optax.linear_schedule(
                lr, lr * scale, max(config.lr_decay_steps, 1)
            )
        sched = optax.join_schedules(
            [optax.constant_schedule(lr), decay], [config.lr_decay_start]
        )
        opt = optax.adam(learning_rate=sched)
    if config.learner_flat_adam:
        opt = optax.flatten(opt)
    return opt


def build_train_step(config: T48Config) -> Callable:
    """The config's jittable learner update (t48/agent/learner.py).

    Cell-major: consumes the CM batches ``replay.sample`` produces and
    evaluates the CM forward (t48/agent/cm_forward.py) — boards [S, N]
    with batch in lanes, no relayout between sampling and the matmuls.
    """
    from t48.agent import cm_forward

    apply_cm = cm_forward.build_cm_forward(
        config.arch, networks.dtype_of(config.compute_dtype)
    )
    return learner_lib.make_train_step(
        apply_cm,
        lambda x: x,  # CM forward takes raw exponent boards directly
        build_optimizer(config),
        config.discount_factor,
        config.use_double_dqn,
        config.compat_zero_update,
        config.learner_fused_apply,
        cm=True,
    )


def create_train_state(
    config: T48Config,
    key: Optional[jax.Array] = None,
    mesh=None,
) -> TrainState:
    """Initialize params, target, optimizer, envs, replay and counters.

    The whole construction runs as ONE jitted program — eager per-op
    dispatch (dozens of zeros/copies) is pathologically slow on
    remote-attached backends.

    With ``mesh`` the init is compiled with the DP ``out_shardings``
    (t48/distrib/mesh.py), so each device materializes its own env/replay
    shards directly — **process-local construction**: on a multi-host
    slice no host ever builds the global state (SURVEY.md §2.3).
    """
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    cells = config.board_k * config.board_k
    net = build_net(config)
    encode = encoder_for(config.arch, config.board_k)
    optimizer = build_optimizer(config)

    def _create(key):
        k_params, k_env, k_run = jax.random.split(key, 3)
        example = jnp.zeros((1, cells), jnp.int8)
        params = net.init(k_params, encode(example))
        env = engine.init(k_env, config.env_batch, config.board_k, config.p_four)
        return TrainState(
            params=params,
            target_params=params,  # hard-synced copy (dqn_lib.py:227-228)
            opt_state=optimizer.init(params),
            env=env,
            ep_reward_sum=jnp.zeros((config.env_batch,), jnp.float32),
            ep_q_sum=jnp.zeros((config.env_batch,), jnp.float32),
            replay=replay_lib.create(
                config.replay_buffer_length, cells, config.env_batch
            ),
            rng=k_run,
            episodes_done=jnp.zeros((), jnp.int32),
            env_steps=jnp.zeros((), jnp.int32),
            train_steps=jnp.zeros((), jnp.int32),
            last_train_episodes=jnp.zeros((), jnp.int32),
            last_sync_episodes=jnp.zeros((), jnp.int32),
            last_loss=jnp.zeros((), jnp.float32),
            log=_create_log(effective_log_size(config), config.env_batch),
        )

    if mesh is None:
        return jax.jit(_create)(key)
    from t48.distrib.mesh import train_state_shardings

    template = jax.eval_shape(_create, key)
    shardings = train_state_shardings(template, mesh, config)
    return jax.jit(_create, out_shardings=shardings)(key)


def make_train_iteration(
    config: T48Config,
    *,
    mesh=None,
    with_policy: bool = True,
    with_replay: bool = True,
    with_learner: bool = True,
    with_log: bool = True,
) -> Callable:
    """Build ``iteration(state) -> (state, snapshot_record)``.

    One iteration = one lockstep env step for all B envs + episode
    accounting + (conditionally) one learner update + target sync.

    The WHOLE iteration is cell-major (batch-minor): boards ``[16, B]``
    with carried legality ``[4, B]`` (``CMEnvState``; ``make_train_chunk``
    converts from/to the checkpointed ``engine.EnvState`` at chunk
    edges), the policy forward is the batch-in-lanes CM network
    (t48/agent/cm_forward.py), replay rows are batch-minor and the
    learner consumes CM samples directly — no transpose/relayout
    anywhere in the per-step program.

    Two env-step backends behind one contract (``resolve_env_backend``):
    ``engine.env_step_cm`` (XLA; CPU tests, odd shapes) and on TPU the
    fused Pallas kernel (t48/ops/pallas_step.pallas_env_step) with the
    board resident in VMEM. Under a mesh the kernel runs inside
    ``jax.shard_map`` over the 'data' axis — each device steps only its
    own env shard, zero cross-device traffic.

    The ``with_*`` flags ablate pipeline stages for the phase-breakdown
    benchmark (t48/analysis/bench.py): ``with_policy=False`` steps with a
    uniform random-legal policy (no network forward); ``with_replay`` /
    ``with_learner`` / ``with_log`` skip replay writes, the learner update
    + target sync, and the episode-ring writes respectively. Training
    always uses the defaults (everything on).
    """
    from t48.agent import cm_forward

    apply_cm = cm_forward.build_cm_forward(
        config.arch, networks.dtype_of(config.compute_dtype)
    )
    train_step = build_train_step(config)
    batch = config.env_batch
    log_size = effective_log_size(config)
    backend = resolve_env_backend(config, mesh)

    if backend == "pallas":
        from t48.ops import pallas_step as ps

        if mesh is None:
            kernel_step = ps.pallas_env_step
        else:
            from jax.sharding import PartitionSpec as P

            def _local_step(bcm, lcm, act, seed):
                # distinct PRNG stream per shard: mix the data-axis index
                # into the second seed word (golden-ratio multiplier so
                # adjacent shards differ in high bits too). The first
                # word already absorbs the kernel's per-block program_id.
                shard = jax.lax.axis_index("data").astype(jnp.int32)
                seed = seed.at[1].set(
                    seed[1] ^ (shard * jnp.int32(-1640531527))
                )
                return ps.pallas_env_step(bcm, lcm, act, seed)

            kernel_step = jax.shard_map(
                _local_step,
                mesh=mesh,
                in_specs=(P(None, "data"), P(None, "data"), P("data"), P()),
                out_specs=(
                    P(None, "data"),
                    P(None, "data"),
                    P(None, "data"),
                    P("data"),
                ),
                check_vma=False,
            )

    def iteration(state: TrainState):
        rng, k_step, k_env, k_sample = jax.random.split(state.rng, 4)

        # ---- ε for the episodes currently in flight (dqn_lib.py:184-188)
        eps = epsilon_schedule(
            state.episodes_done,
            config.no_episodes_to_reach_epsilon,
            config.min_epsilon,
            config.no_episodes_to_fill_up_existing_model_replay_buffer,
        )

        cme: CMEnvState = state.env
        legal_cm_bool = cme.legal_cm != 0  # [4, B]
        done_pre = ~legal_cm_bool.any(0)
        done = done_pre

        # ---- policy on the carried legality (cell-major end-to-end)
        if not with_policy:  # bench ablation: uniform random-legal
            scores = jax.random.uniform(k_step, (4, batch))
            actions = jnp.argmax(
                jnp.where(legal_cm_bool, scores, -1.0), axis=0
            ).astype(jnp.int32)
            max_q = jnp.zeros((batch,), jnp.float32)
        else:
            q_cm = apply_cm(state.params, cme.boards_cm)
            actions, max_q = policy_lib.epsilon_greedy_cm(
                k_step, q_cm, legal_cm_bool, eps, config.policy_compat
            )

        # ---- env step (apply + spawn + auto-reset + next legality)
        if backend == "pallas":
            # Kernel PRNG seed: BOTH 32-bit words of this iteration's
            # threefry key (k_env is already split, unused otherwise on
            # the Pallas path). One word alone repeats by birthday
            # statistics after ~77k iterations — ~50% odds of replaying
            # some earlier iteration's spawn stream for one step within a
            # flagship run (r04 advisor finding); the two-word seed makes
            # a collision a 64-bit event.
            seed = jnp.asarray(k_env).astype(jnp.int32)  # int32[2]
            new_cm, pre_cm, new_legal_cm, reward = kernel_step(
                cme.boards_cm, cme.legal_cm, actions, seed
            )
        else:
            new_cm, pre_cm, new_legal_cm, reward = engine.env_step_cm(
                cme.boards_cm, cme.legal_cm, actions, k_env, config.p_four
            )
        log_merge = cme.merge_scores + reward
        log_steps = cme.step_counts + 1
        max_exp = pre_cm.max(0)  # lane-parallel reduce over the 16 cells
        log_max_tile = jnp.where(
            max_exp > 0, jnp.left_shift(jnp.int32(1), max_exp), 0
        )
        env_out = CMEnvState(
            boards_cm=new_cm,
            legal_cm=new_legal_cm,
            merge_scores=jnp.where(done, 0, log_merge),
            step_counts=jnp.where(done, 0, log_steps),
        )

        # ---- replay append (encode-at-insert, stays cell-major)
        if with_replay:
            transition = replay_lib.CMTransition(
                state=cme.boards_cm,
                action=actions,
                reward=reward.astype(jnp.float32),
                next_state=pre_cm,
                done=done_pre,
            )
            replay = replay_lib.add_step(state.replay, transition)
        else:
            replay = state.replay

        # ---- per-episode accumulators (means logged at episode end)
        ep_reward_sum = state.ep_reward_sum + reward.astype(jnp.float32)
        ep_q_sum = state.ep_q_sum + max_q.astype(jnp.float32)

        # ---- episode completion accounting
        n_done = done.sum().astype(jnp.int32)
        rank = jnp.cumsum(done.astype(jnp.int32)) - 1  # order within batch
        steps_f = jnp.maximum(log_steps.astype(jnp.float32), 1.0)
        log = state.log
        if with_log:
            bits = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
                x.astype(jnp.float32), jnp.int32
            )
            payload = jnp.stack(
                [
                    log_max_tile,
                    log_merge,
                    state.episodes_done + rank,
                    bits(ep_reward_sum / steps_f),
                    bits(ep_q_sum / steps_f),
                    jnp.broadcast_to(bits(eps), (batch,)),
                    log_steps,
                ],
                axis=0,
            )  # [7, B], batch in lanes
            # fused elementwise select-write: env b's next free slot
            slot_sel = (
                jnp.arange(log_size)[:, None] == log.count[None, :]
            ) & done[None, :]  # [R, B]
            log = log.replace(
                data=jnp.where(
                    slot_sel[None, :, :], payload[:, None, :], log.data
                ),
                count=log.count + done.astype(jnp.int32),
            )
        episodes_done = state.episodes_done + n_done

        # ---- zero finished envs' accumulators (boards already reset)
        ep_reward_sum = jnp.where(done, 0.0, ep_reward_sum)
        ep_q_sum = jnp.where(done, 0.0, ep_q_sum)
        env = env_out

        # ---- learner: once per completed episode past the warmup gate.
        # Updates are DEFICIT-DRIVEN: each consumes one owed episode
        # (last_train_episodes += 1), up to max_updates_per_iteration per
        # iteration — the batched generalization of the reference's
        # train-once-per-episode (dqn_lib.py:213-226). At env_batch=1 the
        # cadence is step-for-step the reference's; at env_batch=B setting
        # max_updates ≥ B/mean_episode_len recovers 1 update/episode
        # exactly (unconsumed episodes carry over between iterations).
        if with_learner and config.learner_update_mode == "while":
            # EXACTLY the owed number of updates (≤ max) via lax.while_loop:
            # no speculative flops, no select-merge — at full cadence the
            # owed count per iteration fluctuates well below the worst-case
            # max_updates the scan form must always pay (measured ~1.5x
            # end-to-end at b4096 u40, scripts/learner_profile_r04.py).
            # The per-update RNG stream differs from scan mode (keys split
            # sequentially from the carried key rather than pre-split), a
            # documented distributional-equivalence divergence.
            gate = jnp.int32(config.no_episodes_before_training)
            n_up = max(1, config.max_updates_per_iteration)

            def upd_cond(c):
                _params, _opt, last_train, _ts, _loss, _key, done_n = c
                owed = jnp.maximum(last_train, gate) < episodes_done
                return owed & (replay.fill > 0) & (done_n < n_up)

            def upd_body(c):
                params, opt_state, last_train, train_steps, _loss, key, done_n = c
                key, k_s = jax.random.split(key)
                sampled = replay_lib.sample(
                    replay, k_s, config.batch_size,
                    cap=config.learner_batch_cap,
                )
                out = train_step(
                    params, state.target_params, opt_state, sampled
                )
                return (
                    out.params,
                    out.opt_state,
                    jnp.maximum(last_train, gate) + 1,
                    train_steps + 1,
                    out.loss,
                    key,
                    done_n + 1,
                )

            carry = jax.lax.while_loop(
                upd_cond,
                upd_body,
                (
                    state.params,
                    state.opt_state,
                    state.last_train_episodes,
                    state.train_steps,
                    state.last_loss,
                    k_sample,
                    jnp.int32(0),
                ),
            )
            params, opt_state, last_train_episodes, train_steps, loss = carry[:5]
        elif with_learner:
            gate = jnp.int32(config.no_episodes_before_training)
            n_up = max(1, config.max_updates_per_iteration)

            def run_updates(carry, keys):
                def one_update(carry, k_s):
                    params, opt_state, last_train, train_steps, last_loss = carry
                    # episodes at or before the warmup gate are never owed
                    owed_from = jnp.maximum(last_train, gate)
                    should = (owed_from < episodes_done) & (replay.fill > 0)
                    # Unconditional update + select-merge instead of a
                    # per-update ``lax.cond``: at large env_batch an episode
                    # completes nearly every iteration so the branch is
                    # ~always taken, and cond's branch machinery (per-leaf
                    # result copies, a fusion barrier in the scan body)
                    # measured ~3x the cost of the update itself
                    # (scripts/learner_microbench.py). The selects fuse into
                    # the update's own elementwise ops.
                    sampled = replay_lib.sample(
                        replay, k_s, config.batch_size,
                        cap=config.learner_batch_cap,
                    )
                    out = train_step(
                        params, state.target_params, opt_state, sampled
                    )
                    keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
                        lambda n, o: jnp.where(should, n, o), new, old
                    )
                    return (
                        keep(out.params, params),
                        keep(out.opt_state, opt_state),
                        jnp.where(should, owed_from + 1, last_train),
                        train_steps + should.astype(jnp.int32),
                        jnp.where(should, out.loss, last_loss),
                    ), None

                if n_up == 1:
                    return one_update(carry, keys[0])[0]
                return jax.lax.scan(one_update, carry, keys)[0]

            carry0 = (
                state.params,
                state.opt_state,
                state.last_train_episodes,
                state.train_steps,
                state.last_loss,
            )
            update_keys = jax.random.split(k_sample, n_up)
            if config.env_batch < 256:
                # Trace-time strategy gate: at small env_batch episodes
                # complete only every few hundred iterations, so the
                # speculative update would waste a full batch_size learner
                # step nearly every iteration (and run all through the
                # warmup). ``lax.cond`` skips the whole update block when
                # nothing is owed; at env_batch ≥ 256 an episode completes
                # almost every iteration (mean episode ≈ 144 steps) and
                # the speculative select-merge path wins.
                any_owed = (
                    jnp.maximum(state.last_train_episodes, gate)
                    < episodes_done
                ) & (replay.fill > 0)
                carry = jax.lax.cond(
                    any_owed,
                    lambda c: run_updates(c, update_keys),
                    lambda c: c,
                    carry0,
                )
            else:
                carry = run_updates(carry0, update_keys)
            params, opt_state, last_train_episodes, train_steps, loss = carry
        else:
            params, opt_state = state.params, state.opt_state
            loss = state.last_loss
            train_steps = state.train_steps
            last_train_episodes = state.last_train_episodes

        if with_learner:
            # ---- hard target sync on crossing each sync-period multiple
            sync_every = config.no_episodes_before_updating_target
            should_sync = (episodes_done // sync_every) > (
                state.last_sync_episodes // sync_every
            )
            target_params = jax.tree_util.tree_map(
                lambda p, t: jnp.where(should_sync, p, t),
                params,
                state.target_params,
            )
            last_sync_episodes = jnp.where(
                should_sync, episodes_done, state.last_sync_episodes
            )
        else:
            target_params = state.target_params
            last_sync_episodes = state.last_sync_episodes

        new_state = TrainState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            env=env,
            ep_reward_sum=ep_reward_sum,
            ep_q_sum=ep_q_sum,
            replay=replay,
            rng=rng,
            episodes_done=episodes_done,
            env_steps=state.env_steps + batch,
            train_steps=train_steps,
            last_train_episodes=last_train_episodes,
            last_sync_episodes=last_sync_episodes,
            last_loss=loss,
            log=log,
        )
        snapshot = SnapshotStream(
            board=cme.boards_cm[:, 0].astype(jnp.int8),  # one [16] column
            action=actions[0].astype(jnp.int8),
            reward=reward[0],
            done=done[0],
        )
        return new_state, snapshot

    return iteration


def make_train_chunk(config: T48Config, mesh=None, **ablation_flags) -> Callable:
    """Jitted ``chunk(state) -> (state, SnapshotStream[T])`` running
    ``config.chunk_iters`` iterations under ``lax.scan``. The episode
    log's per-env counts reset at chunk entry (the host drains after
    every chunk; ``effective_log_size`` bounds completions per chunk, so
    the slots can never overflow between drains).

    With ``mesh`` the output shardings are pinned to the declared DP
    layout (t48/distrib/mesh.py). This matters on a multi-host slice:
    left to itself GSPMD shards the episode log along ``data`` (its
    writes are elementwise in the env axis), but the coordinator must
    ``device_get`` the log to drain it, which requires every shard to be
    process-addressable — i.e. the log must come back replicated (XLA
    inserts the small per-iteration payload all-gather).

    Keyword flags pass through to ``make_train_iteration`` (bench
    ablations only)."""
    iteration = make_train_iteration(config, mesh=mesh, **ablation_flags)

    def chunk(state: TrainState):
        state = state.replace(
            log=state.log.replace(count=jnp.zeros_like(state.log.count))
        )
        # the whole in-chunk program is cell-major; the public TrainState
        # keeps the checkpointed batch-major EnvState (one conversion per
        # chunk edge, not per iteration)
        state = state.replace(env=_to_cm_env(state.env))
        state, snaps = jax.lax.scan(
            lambda s, _: iteration(s), state, None, length=config.chunk_iters
        )
        state = state.replace(env=_from_cm_env(state.env, config.board_k))
        return state, snaps

    if mesh is None:
        return jax.jit(chunk)
    from jax.sharding import NamedSharding, PartitionSpec
    from t48.distrib.mesh import train_state_shardings

    template = jax.eval_shape(lambda: create_train_state(config))
    state_sh = train_state_shardings(template, mesh, config)
    rep = NamedSharding(mesh, PartitionSpec())
    snap_sh = SnapshotStream(board=rep, action=rep, reward=rep, done=rep)
    return jax.jit(chunk, out_shardings=(state_sh, snap_sh))


# --------------------------------------------------------------------------
# Counter rebasing (overflow proofing).
#
# The device keeps all counters int32 (TPU-native width; int64 needs the
# global x64 switch). At sustained round-3 rates `env_steps` crosses 2^31 in
# ~195s and `episodes_done` in ~7h, which would corrupt loop control, the
# schedules and the episode numbering (VERDICT r03 weak #2). The fix is
# split:
#   - `env_steps` has NO device consumers (the Pallas seed now derives from
#     the per-iteration threefry key), so the trainer just accumulates
#     wrap-aware deltas into an exact Python int (trainer.HostCounters).
#   - `episodes_done` drives the ε schedule, the learner/warmup gates and
#     the target-sync modulus, so it must stay small ON DEVICE: the trainer
#     subtracts a multiple of the sync period long before 2^31
#     (`rebase_counters`), which provably preserves every consumer —
#     thresholds (ε horizon, warmup gates) stay saturated because the
#     rebased value stays above `rebase_keep_min`, the sync condition
#     compares floor-divisions whose residues shift by the same multiple of
#     `sync_every`, and the learner deficit `episodes_done − max(last_train,
#     gate)` is invariant because all three counters shift together.
#     Absolute episode numbers are reconstructed at drain time from the
#     cumulative subtracted base (`finish_drain(number_base=...)`).
# --------------------------------------------------------------------------


def rebase_keep_min(config: T48Config) -> int:
    """Smallest device episode count that keeps every schedule consumer
    in its saturated/steady regime after a rebase."""
    return (
        max(
            config.no_episodes_to_reach_epsilon,
            config.no_episodes_before_training,
            config.no_episodes_to_fill_up_existing_model_replay_buffer,
        )
        + 1
    )


# Largest learner-deficit / sync-lag the rebase preserves exactly. A
# backlog beyond this is unconsumable under any finite max_updates
# (every iteration consumes ≤ max_updates of it while ~env_batch/144 new
# episodes accrue), so clamping it to a million keeps the overflow
# protection effective for under-cadenced or learner-free configs whose
# lag would otherwise grow without bound and pin the rebase slack at 0,
# letting episodes_done wrap after all (r04 review finding).
REBASE_LAG_CAP = 1 << 20


def rebase_amount(config: T48Config, episodes_done: int, last_train: int,
                  last_sync: int) -> int:
    """The largest sync-period multiple that keeps all three episode
    counters ≥ ``rebase_keep_min`` (host-side, plain ints) — after
    clamping unbounded lags to ``REBASE_LAG_CAP`` (the device applies
    the identical clamp in ``rebase_counters``)."""
    sync = max(config.no_episodes_before_updating_target, 1)
    last_train = max(last_train, episodes_done - REBASE_LAG_CAP)
    last_sync = max(last_sync, episodes_done - REBASE_LAG_CAP)
    slack = min(episodes_done, last_train, last_sync) - rebase_keep_min(config)
    return max(0, slack // sync * sync)


@jax.jit
def rebase_counters(state: TrainState, amount) -> TrainState:
    """Shift the episode counters down by ``amount`` (see block comment).

    Lags beyond ``REBASE_LAG_CAP`` are clamped first (matching
    ``rebase_amount``): for the learner deficit this forfeits owed
    updates beyond a million — unconsumable backlog by construction;
    for the sync counter it leaves at most one pending sync (the clamp
    keeps the ``episodes_done − last_sync ≥ sync_every`` trigger
    condition satisfied whenever it was).
    """
    amount = jnp.asarray(amount, jnp.int32)
    cap = jnp.int32(REBASE_LAG_CAP)
    return state.replace(
        episodes_done=state.episodes_done - amount,
        last_train_episodes=jnp.maximum(
            state.last_train_episodes, state.episodes_done - cap
        ) - amount,
        last_sync_episodes=jnp.maximum(
            state.last_sync_episodes, state.episodes_done - cap
        ) - amount,
    )


def start_drain(log: EpisodeLog):
    """Phase 1 of the episode drain: read the per-env counts and ENQUEUE
    the live-prefix slice of the log ring on the device.

    Call this BEFORE dispatching the next chunk: the slice is a device
    op, and a TPU runs one program at a time — enqueued after the next
    chunk it would wait the whole chunk out, serializing the drain with
    device execution. Enqueued here it runs immediately after the chunk
    that produced the log, and its transfer then overlaps the next
    chunk. Returns an opaque handle for ``finish_drain``.
    """
    import numpy as np

    counts = np.asarray(jax.device_get(log.count))  # [B]
    r = log.data.shape[1]
    # transfer only the live slot prefix: the provable worst-case slot
    # capacity R is ~19 per env per 256-iter chunk but the typical max is
    # 2-6, and on a remote-attached backend the full-ring transfer
    # dominates the whole drain (~330ms for [7,19,16384] vs ~100ms live)
    m_live = int(min(counts.max(initial=0), r))
    data_fut = log.data[:, :m_live, :] if m_live else None
    return counts, r, data_fut


def drain_episode_log(log: EpisodeLog, number_base: int = 0):
    """Host-side: extract this chunk's completed episodes.

    Returns (episodes list in global completion order, dropped).
    ``dropped`` counts completions beyond an env's slot capacity; with
    slots sized by ``effective_log_size`` this is provably always 0 when
    draining once per chunk (the trainer asserts it).

    Pipelined callers use ``start_drain`` + ``finish_drain`` instead
    (same result; the device slice overlaps the next chunk).
    """
    return finish_drain(start_drain(log), number_base)


class EpisodeList(list):
    """Episode dicts plus (optionally) their pre-formatted JSONL bytes
    (the native episode sink, t48/native/board2048.cpp) — duck-typed as
    a plain list everywhere; ``Experiment.add_episodes`` uses ``jsonl``
    when present to skip Python-side formatting."""

    jsonl = None  # Optional[bytes]


def finish_drain(handle, number_base: int = 0, build_dicts: bool = True):
    """Phase 2 of the episode drain: fetch the live slice and build the
    episode records (see ``start_drain``).

    ``number_base`` is added to each episode's ``number``: the device
    counts episodes in an int32 the trainer periodically REBASES to keep
    it far from 2^31 (loop control and schedules would corrupt on wrap
    at sustained rates — VERDICT r03 weak #2); the host carries the
    cumulative subtracted amount and reconstructs absolute numbers here.

    ``build_dicts=False`` (stream-retention runs): when the native JSONL
    sink is available, only the LAST episode's dict is built (the
    console line needs it) — the O(episodes) Python dict construction is
    exactly the host work stream mode exists to avoid. Falls back to
    full dicts when the native formatter is missing (the Python JSONL
    path needs them).
    """
    import numpy as np

    counts, r, data_fut = handle
    dropped = int(np.maximum(counts - r, 0).sum())
    if data_fut is None:
        return EpisodeList(), dropped
    m_live = data_fut.shape[1]
    data = np.asarray(jax.device_get(data_fut))
    live = np.arange(m_live)[:, None] < counts[None, :]  # [m, B]
    rows = data[:, live].T  # [N, 7] int32
    if not rows.size:
        return EpisodeList(), dropped
    rows = rows[np.argsort(rows[:, _LOG_NUMBER_COL], kind="stable")]
    jsonl = None
    try:  # native episode sink: pre-format the JSONL off the int rows
        from t48 import native

        jsonl = native.format_episodes_jsonl(rows, number_base)
    except Exception:
        pass  # Python formatting fallback in Experiment.add_episodes
    if not build_dicts and jsonl is not None:
        rows = rows[-1:]  # console line only
    floats = np.ascontiguousarray(rows[:, list(_LOG_FLOAT_COLS)]).view(
        np.float32
    )
    # bulk tolist() + dict literals: ~4x faster than per-element
    # int()/float() casts (this runs for every completed episode — up to
    # hundreds of thousands per second at large env batches). Episode
    # numbers go through int64 so absolute values past 2^31 survive.
    int_rows = rows[:, [0, 1, 6]].tolist()
    nums = (
        rows[:, _LOG_NUMBER_COL].astype(np.int64) + number_base
    ).tolist()
    flt_rows = floats.tolist()
    episodes = EpisodeList(
        {
            "max_tile": mt,
            "merge_score": ms,
            "number": num,
            "reward": rw,
            "q_value": qv,
            "epsilon": eps,
            "number_moves": mv,
        }
        for (mt, ms, mv), num, (rw, qv, eps) in zip(int_rows, nums, flt_rows)
    )
    episodes.jsonl = jsonl
    return episodes, dropped
