"""Dataclass configs with per-experiment presets.

The reference defines configs as Python modules that build torch models at
import time and star-export ~16 globals (SURVEY.md C16;
/root/reference/src/configs/double_dqn_{conv,dense,sss}.py). Here a config
is a frozen dataclass; models/optimizers are built from it explicitly by
the trainer. The three presets mirror the reference's names and values
exactly; TPU-native knobs (env batch, mesh shape, policy compat) are
additive.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class T48Config:
    """All hyperparameters of one experiment.

    The first block mirrors the reference's HYPERPARAMS dict keys
    (configs/double_dqn_conv.py:49-65) so saved hyperparams JSON is
    comparable side-by-side.
    """

    name: str = "double_dqn_conv"
    arch: str = "conv"  # 'dense' | 'conv'
    batch_size: int = 5000
    discount_factor: float = 0.80
    replay_buffer_length: int = 15000
    learning_rate: float = 1e-2
    no_episodes: int = 30000
    no_episodes_to_reach_epsilon: int = 1000
    min_epsilon: float = 0.01
    no_episodes_before_training: int = 700
    no_episodes_before_updating_target: int = 100
    no_episodes_to_fill_up_existing_model_replay_buffer: int = 0
    use_double_dqn: bool = True
    snapshot_game_every_n_episodes: int = 500

    # --- TPU-native additions (net-new; reference is single-board CPU) ---
    env_batch: int = 1024  # lockstep environments (global, across the mesh)
    board_k: int = 4
    p_four: float = 0.5  # spawn-a-4 probability (reference: uniform 0.5)
    policy_compat: str = "masked"  # 'masked' | 'reference' (dqn_lib.py:25-26)
    compat_zero_update: bool = False  # emulate dqn_lib.py:161-163 bug
    seed: int = 0
    chunk_iters: int = 256  # env steps per jitted scan chunk
    episode_log_size: int = 8192  # on-device episode metrics ring capacity
    # A*-seeded replay warm-start (reference: double_dqn_conv_sss.py:65)
    use_astar_seed: bool = False
    astar_games: int = 100
    astar_max_expansions: int = 20000
    # sanitizers (SURVEY.md §5): per-chunk env invariant assertions
    debug_invariants: bool = False
    # multi-host failure detection (SURVEY.md §5): if a train chunk takes
    # longer than this, assume a peer process died mid-collective — dump
    # this process's shards (collective-free) and exit. 0 disables.
    watchdog_timeout_s: float = 0.0
    # per-episode metric retention: 'full' keeps every episode dict in
    # memory and pickles them at save (the reference's episodes.p
    # artifact, experiments.py:128-145); 'stream' appends the JSONL only
    # — O(1) memory for soak/production runs that complete tens of
    # millions of episodes (episodes.p then holds only the header list).
    episode_retention: str = "full"  # 'full' | 'stream'
    # minimum seconds between periodic autosaves. The reference saves
    # every 1000 episodes (dqn_lib.py:229-231) — at ~250k episodes/s
    # that fires every chunk and the (collective) state gather + host
    # write throttles the device; the episode gate still applies, this
    # additionally rate-limits in wall time. 0 = reference behavior.
    autosave_min_interval_s: float = 30.0
    # --- learner compute options. Defaults follow IN-LOOP round-robin
    # measurements on v5e (benchmarks/learner_flags_r03.md), which
    # overturn the isolated microbench (scripts/learner_microbench.py):
    # bf16 compute helps ~5%; the fused [2B] apply and optax.flatten both
    # LOSE in-loop (the fused apply's interleave relayout and flatten's
    # per-update ravel/unravel cost more than the matmul fusion saves at
    # these tiny model sizes) — flags kept for larger models. ---
    compute_dtype: str = "bfloat16"  # network compute dtype; params stay f32
    learner_fused_apply: bool = False  # q(s) + q_online(s') in ONE [2B] apply
    learner_flat_adam: bool = False  # optax.flatten: one fused vector Adam
    # cap the effective learner batch at batch_size regardless of env_batch
    # (without it the per-env stratified sample floors at 1 row/env, so the
    # learner batch silently inflates to env_batch when env_batch > batch_size)
    learner_batch_cap: bool = True
    # learner updates per env iteration. Updates are deficit-driven — each
    # consumes one owed completed episode, so cadence converges to the
    # reference's one-update-per-episode (dqn_lib.py:213-226) whenever this
    # is >= the mean episodes completed per iteration (~env_batch/144).
    max_updates_per_iteration: int = 1
    # how the per-iteration updates execute (t48/train/loop.py):
    # 'while' (default): a lax.while_loop running EXACTLY the owed number
    # of updates (up to the max) — no speculative waste, no select-merge.
    # At full cadence with a worst-case max (u40 at env_batch=4096, mean
    # owed ~28/iter) the while form measured 1.39M vs the scan form's
    # 1.08M env-steps/s in-chunk at 1.0 updates/episode
    # (scripts/learner_profile_r04.py --mode flags). 'scan': the r03
    # speculative select-merge scan (always runs max_updates; kept for
    # comparison and for the exact r03 RNG stream).
    learner_update_mode: str = "while"  # 'while' | 'scan'
    # in-loop env step backend: 'auto' picks the fused Pallas kernel
    # (t48/ops/pallas_step.py) on TPU when shapes allow, else the XLA
    # engine. The Pallas path uses the TPU-native PRNG — a different (but
    # deterministic) random stream than the XLA path's threefry.
    env_backend: str = "auto"  # 'auto' | 'xla' | 'pallas'
    # --- learning-rate schedule (r05; documented divergence — the
    # reference's optimizer is constant-lr Adam). 'constant' builds the
    # EXACT r04 optimizer (opt_state structure unchanged, old checkpoints
    # restore). 'cosine'/'linear' hold ``learning_rate`` for
    # ``lr_decay_start`` updates then decay to ``learning_rate *
    # lr_final_scale`` over ``lr_decay_steps`` updates (update count ==
    # episode count at the reference's 1-update-per-episode cadence, so
    # episode-denominated horizons translate directly). A staged schedule
    # that decays only after the 17,758-episode reference checkpoint
    # leaves the curve-fidelity window untouched. ---
    lr_schedule: str = "constant"  # 'constant' | 'cosine' | 'linear'
    lr_decay_start: int = 20000  # updates at full lr before decay begins
    lr_decay_steps: int = 100000  # decay horizon in updates
    lr_final_scale: float = 0.1  # final lr = learning_rate * this

    def __post_init__(self):
        # enum-like knobs fail loudly on typos (a misspelled value would
        # otherwise silently select the other behavior)
        _check = {
            "learner_update_mode": ("while", "scan"),
            "episode_retention": ("full", "stream"),
            "env_backend": ("auto", "xla", "pallas"),
            "policy_compat": ("masked", "reference"),
            "compute_dtype": ("float32", "bfloat16"),
            "lr_schedule": ("constant", "cosine", "linear"),
        }
        for field, allowed in _check.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(
                    f"{field}={v!r} not in {allowed}"
                )
        # Overflow-protection precondition (r04 advisor finding): the
        # trainer rebases the int32 device episode counter at 2^30 by a
        # multiple of the target-sync period while keeping every schedule
        # consumer saturated (t48/train/loop.py rebasing note). If the
        # schedule horizons or the sync period eat the whole 2^30 slack,
        # rebase_amount returns 0 forever and the counter would silently
        # wrap after all — reject such configs up front.
        keep_min = max(
            self.no_episodes_to_reach_epsilon,
            self.no_episodes_before_training,
            self.no_episodes_to_fill_up_existing_model_replay_buffer,
        ) + 1
        sync = max(self.no_episodes_before_updating_target, 1)
        if keep_min + sync >= 1 << 30:
            raise ValueError(
                f"schedule horizons leave no rebase slack: "
                f"max(schedule episodes)+1 ({keep_min}) + target-sync "
                f"period ({sync}) must stay below 2^30 or the int32 "
                f"episode counter cannot be rebased away from overflow"
            )

    def hyperparams_dict(self) -> dict:
        """Reference-comparable hyperparams mapping (experiments.py:104-110
        consumers expect these keys)."""
        return {
            "batch_size": self.batch_size,
            "discount_factor": self.discount_factor,
            "model": f"t48.{self.arch}",
            "replay_buffer_length": self.replay_buffer_length,
            "learning_rate": self.learning_rate,
            "loss_fn": "mse(reduction=sum)",
            "optimizer": f"adam(lr={self.learning_rate})",
            "no_episodes": self.no_episodes,
            "no_episodes_to_reach_epsilon": self.no_episodes_to_reach_epsilon,
            "no_episodes_before_training": self.no_episodes_before_training,
            "no_episodes_before_updating_target": self.no_episodes_before_updating_target,
            "no_episodes_to_fill_up_existing_model_replay_buffer": (
                self.no_episodes_to_fill_up_existing_model_replay_buffer
            ),
            "min_epsilon": self.min_epsilon,
            "use_double_dqn": self.use_double_dqn,
            "snapshot_game_every_n_episodes": self.snapshot_game_every_n_episodes,
            # TPU-native additions
            "env_batch": self.env_batch,
            "policy_compat": self.policy_compat,
            "seed": self.seed,
            "compute_dtype": self.compute_dtype,
            "max_updates_per_iteration": self.max_updates_per_iteration,
            **(
                {
                    "lr_schedule": self.lr_schedule,
                    "lr_decay_start": self.lr_decay_start,
                    "lr_decay_steps": self.lr_decay_steps,
                    "lr_final_scale": self.lr_final_scale,
                }
                if self.lr_schedule != "constant"
                else {}
            ),
        }

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "T48Config":
        return T48Config(**json.loads(text))

    def replace(self, **kw) -> "T48Config":
        return dataclasses.replace(self, **kw)


def double_dqn_conv(**overrides) -> T48Config:
    """Mirror of configs/double_dqn_conv.py:33-47."""
    return T48Config(name="double_dqn_conv", arch="conv").replace(**overrides)


def double_dqn_dense(**overrides) -> T48Config:
    """Mirror of configs/double_dqn_dense.py:17-31 (replay 100k, 50k eps)."""
    return T48Config(
        name="double_dqn_dense",
        arch="dense",
        replay_buffer_length=100_000,
        no_episodes=50_000,
    ).replace(**overrides)


def double_dqn_conv_sss(**overrides) -> T48Config:
    """Mirror of configs/double_dqn_sss.py (conv net, replay 100k, 50k eps)
    with the A*-seeded replay warm-start (double_dqn_conv_sss.py:65)."""
    return T48Config(
        name="double_dqn_conv_sss",
        arch="conv",
        replay_buffer_length=100_000,
        no_episodes=50_000,
        use_astar_seed=True,
    ).replace(**overrides)


def sss_published(**overrides) -> T48Config:
    """The hyperparameters of the reference's PUBLISHED ``SSS_replay``
    run — the one whose learning curve BASELINE.md quotes (γ=0.95,
    lr=1e-4, replay 15k, batch 5000, ε-decay over 500 episodes,
    train-after-50, target-sync-100; captured in
    experiment_analysis.ipynb cell-3 output). The committed config
    modules carry different values (γ=0.80, lr=1e-2), so curve-matching
    runs must use THIS preset."""
    return T48Config(
        name="sss_published",
        arch="conv",
        batch_size=5000,
        discount_factor=0.95,
        replay_buffer_length=15000,
        learning_rate=1e-4,
        no_episodes=30000,
        no_episodes_to_reach_epsilon=500,
        min_epsilon=0.01,
        no_episodes_before_training=50,
        no_episodes_before_updating_target=100,
        use_astar_seed=True,
    ).replace(**overrides)


PRESETS = {
    "double_dqn_conv": double_dqn_conv,
    "double_dqn_dense": double_dqn_dense,
    "double_dqn_conv_sss": double_dqn_conv_sss,
    "sss_published": sss_published,
    # short aliases
    "conv": double_dqn_conv,
    "dense": double_dqn_dense,
    "conv_sss": double_dqn_conv_sss,
}


def get_preset(name: str, **overrides) -> T48Config:
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name](**overrides)
