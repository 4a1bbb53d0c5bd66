"""t48 CLI: train / evaluate / seed-replay / play / bench.

Replaces the reference's three driver scripts + player + interactive main
(/root/reference/src/double_dqn_{conv,dense}.py, double_dqn_conv_sss.py,
player.py:91-106, board.py:263-271) with one argparse CLI:

  python -m t48 train --preset conv --job myrun
  python -m t48 train --preset dense --env-batch 2048
  python -m t48 evaluate --job myrun --games 1000
  python -m t48 baselines --games 1000          # random + upleft runs
  python -m t48 seed-replay --games 100 --out seed.npz
  python -m t48 play                            # interactive stdin game
  python -m t48 bench

The reference asks for the job name interactively (double_dqn_conv.py:19);
``--job`` passes it as a flag, and omitting it auto-names the folder the
same way (exp_{n}_{hash}, experiments.py:100-102).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_config_overrides(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--preset", default="conv",
                        help="double_dqn_conv|double_dqn_dense|double_dqn_conv_sss "
                             "(aliases: conv, dense, conv_sss)")
    parser.add_argument("--env-batch", type=int, default=None)
    parser.add_argument("--episodes", type=int, default=None,
                        help="override no_episodes")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--chunk-iters", type=int, default=None)
    parser.add_argument("--policy-compat", choices=["masked", "reference"],
                        default=None)
    parser.add_argument("--max-updates", type=int, default=None,
                        help="learner updates per env iteration "
                             "(deficit-driven; ~env_batch/144 recovers the "
                             "reference's one-update-per-episode cadence)")
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None)
    parser.add_argument("--env-backend", choices=["auto", "xla", "pallas"],
                        default=None)
    parser.add_argument("--replay-length", type=int, default=None,
                        help="override replay_buffer_length")


def _build_config(args):
    from t48.configs import get_preset

    overrides = {}
    if args.env_batch is not None:
        overrides["env_batch"] = args.env_batch
    if args.episodes is not None:
        overrides["no_episodes"] = args.episodes
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.learning_rate is not None:
        overrides["learning_rate"] = args.learning_rate
    if args.chunk_iters is not None:
        overrides["chunk_iters"] = args.chunk_iters
    if args.policy_compat is not None:
        overrides["policy_compat"] = args.policy_compat
    if args.max_updates is not None:
        overrides["max_updates_per_iteration"] = args.max_updates
    if args.compute_dtype is not None:
        overrides["compute_dtype"] = args.compute_dtype
    if args.env_backend is not None:
        overrides["env_backend"] = args.env_backend
    if args.replay_length is not None:
        overrides["replay_buffer_length"] = args.replay_length
    return get_preset(args.preset, **overrides)


def cmd_train(args) -> int:
    from t48.train.trainer import train

    config = _build_config(args)
    state, experiment = train(
        config,
        root_dir=args.root,
        job_name=args.job,
        resume=args.resume,
        max_episodes=args.max_episodes,
        data_parallel=args.data_parallel,
    )
    # overflow-proof absolute totals (the device ints are int32 and may
    # have been rebased/wrapped on long runs)
    totals = getattr(experiment, "hyperparameters", {}).get(
        "counter_totals", {}
    )
    episodes = totals.get("episodes", int(state.episodes_done))
    updates = totals.get("train_steps", int(state.train_steps))
    print(f"Training complete: {episodes} episodes, "
          f"{updates} learner updates → {experiment.folder}")
    return 0


def cmd_evaluate(args) -> int:
    import os

    import jax
    import jax.numpy as jnp

    from t48.agent.networks import build_network, dtype_of
    from t48.baselines.players import Player
    from t48.configs import T48Config
    from t48.exp.checkpoint import restore_subtree
    from t48.exp.experiment import Experiment
    from t48.train.loop import encoder_for

    experiment = Experiment(root_dir=args.root, folder_name=args.job, resumed=True)
    config_path = os.path.join(experiment.folder, "text/config.json")
    with open(config_path) as f:
        config = T48Config.from_json(f.read())
    # evaluate under the job's TRAINING compute dtype by default: a
    # bf16-compute run's greedy actor saw bf16 Q-values, and f32 eval can
    # flip argmaxes near ties (VERDICT r03 weak #5). --dtype overrides.
    dtype = dtype_of(args.dtype or config.compute_dtype)
    net = build_network(config.arch, dtype)
    encode = encoder_for(config.arch, config.board_k)
    # params-only load: init a template of the right structure and restore
    # the checkpoint's `.params` subtree by name — no replay buffer / env /
    # optimizer allocation just to evaluate.
    cells = config.board_k * config.board_k
    template = net.init(jax.random.PRNGKey(0), encode(jnp.zeros((1, cells), jnp.int8)))
    params = restore_subtree(experiment.checkpoint_path, template, ".params")
    player = Player(
        experiment=experiment,
        apply_fn=net.apply,
        params=params,
        encode=encode,
        encoding=args.encoding,
        lookahead=getattr(args, "lookahead", False),
        gamma=config.discount_factor,
    )
    stats = player.play_n_games(
        args.games, seed=args.seed, record_history=args.histories,
        # lookahead programs evaluate 32 child boards per game per cell
        # tap — chunk large runs so no single device program runs tens
        # of seconds (the remote worker dies on very long programs)
        device_batch=1000 if getattr(args, "lookahead", False) else 0,
    )
    print(json.dumps(stats, indent=2))
    return 0


def cmd_baselines(args) -> int:
    """The reference's player.py main(): 1000 random + 1000 upleft games
    into random_baseline/ and upleft_baseline/ folders (player.py:91-106)."""
    from t48.baselines.players import Player
    from t48.exp.experiment import Experiment

    print("Random Games")
    random_exp = Experiment(root_dir=args.root, folder_name="random_baseline")
    random_player = Player(experiment=random_exp)
    stats = random_player.play_n_games(args.games, random=True, seed=args.seed,
                                       record_history=args.histories)
    print(json.dumps(stats, indent=2))

    print("Upleft games")
    upleft_exp = Experiment(root_dir=args.root, folder_name="upleft_baseline")
    upleft_player = Player(experiment=upleft_exp)
    stats = upleft_player.play_n_games(args.games, upleft=True, seed=args.seed,
                                       record_history=args.histories)
    print(json.dumps(stats, indent=2))
    return 0


def cmd_seed_replay(args) -> int:
    import numpy as np

    from t48.search.seeding import generate_replay_transitions

    tr = generate_replay_transitions(
        games=args.games,
        max_expansions=args.max_expansions,
        seed=args.seed,
        verbose=True,
    )
    np.savez(
        args.out,
        state=tr.state,
        action=tr.action,
        reward=tr.reward,
        next_state=tr.next_state,
        done=tr.done,
    )
    print(f"{tr.action.shape[0]} transitions → {args.out}")
    return 0


def cmd_play(args) -> int:
    """Interactive stdin game (board.py:263-271)."""
    from t48.env.golden import GoldenBoard

    board = GoldenBoard()
    board.show(ignore_zeros=True)
    while True:
        try:
            move = input("What is your next move: ")
        except EOFError:
            break
        if not move:
            break
        try:
            board = board.peek_action(move)
        except ValueError as e:
            print(e)
            continue
        board.show(ignore_zeros=True)
        if not board.available_moves_mask().any():
            print("No moves left!")
            break
    print(f"Final Score: {board.merge_score()}")
    return 0


def cmd_analyze(args) -> int:
    """Learning-curve + max-tile report for a job (the reference's
    experiment_analysis.ipynb as a command). ``--vs-reference`` prints
    the side-by-side max-tile table against the reference's published
    SSS_replay distribution (BASELINE.md)."""
    import os

    from t48.analysis.report import format_reference_comparison, render_report

    report = render_report(os.path.join(args.root, args.job))
    if args.vs_reference:
        print(format_reference_comparison(report["vs_reference"]))
    else:
        print(json.dumps(report, indent=2))
    return 0


def cmd_playback(args) -> int:
    """Step through a snapshotted game (the reference's
    strategy_analysis.ipynb as a command): prints each recorded
    (board, action, reward) step."""
    import os
    import pickle

    import numpy as np

    path = os.path.join(
        args.root, args.job, "binary/board_histories", f"episode_{args.episode}.p"
    )
    if not os.path.isfile(path):
        folder = os.path.dirname(path)
        have = sorted(os.listdir(folder)) if os.path.isdir(folder) else []
        print(f"no snapshot {path}; available: {have}")
        return 1
    with open(path, "rb") as f:
        history = pickle.load(f)
    for t, (state, action, reward) in enumerate(history):
        print(f"step {t}: action={action} reward={reward}")
        print(np.asarray(state))
        if args.interactive:
            try:
                if input("<enter>=next, q=quit: ").strip() == "q":
                    break
            except EOFError:
                break
    print(f"{len(history)} steps")
    return 0


def cmd_bench(args) -> int:
    if args.train:
        from t48.analysis.bench import run_train_bench

        result = run_train_bench(
            preset=args.preset,
            env_batches=tuple(args.train_batches),
            chunk_iters=args.chunk_iters,
        )
    elif args.breakdown:
        from t48.analysis.bench import run_phase_breakdown

        result = run_phase_breakdown(
            preset=args.preset,
            env_batch=args.env_batch,
            chunk_iters=args.chunk_iters,
        )
    elif args.roofline:
        from t48.analysis.bench import env_kernel_roofline

        result = env_kernel_roofline(env_batch=args.env_batch, iters=args.iters)
    else:
        from t48.analysis.bench import run_bench

        result = run_bench(env_batch=args.env_batch, iters=args.iters)
    print(json.dumps(result))
    return 0


def _enable_compile_cache() -> None:
    """Persistent XLA/Mosaic compilation cache (same one bench.py uses):
    the Pallas kernels can take minutes to compile through a remote
    compile service, but a cached executable loads in seconds across
    processes. Best-effort — ignored off-JAX or if the config knob is
    unavailable."""
    try:
        import os

        import jax

        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def main(argv=None) -> int:
    _enable_compile_cache()
    parser = argparse.ArgumentParser(prog="t48", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="run a training job")
    _add_config_overrides(p)
    p.add_argument("--job", default=None, help="job folder name")
    p.add_argument("--root", default="experiments")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-episodes", type=int, default=None,
                   help="stop early after this many episodes")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="shard envs/replay over N devices (0 = all)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="play games with a trained model")
    p.add_argument("--job", required=True)
    p.add_argument("--root", default="experiments")
    p.add_argument("--games", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--encoding", choices=["log", "normalized"], default="log")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                   help="network compute dtype (default: the job's "
                        "training compute_dtype)")
    p.add_argument("--histories", action="store_true",
                   help="record and persist full game histories")
    p.add_argument("--lookahead", action="store_true",
                   help="depth-1 expectimax over the learned Q instead "
                        "of greedy argmax (r05 capability demo)")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("baselines", help="random + upleft baseline runs")
    p.add_argument("--root", default="experiments")
    p.add_argument("--games", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--histories", action="store_true")
    p.set_defaults(fn=cmd_baselines)

    p = sub.add_parser("seed-replay", help="generate A*-seeded transitions")
    p.add_argument("--games", type=int, default=100)
    p.add_argument("--max-expansions", type=int, default=20000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="seed_replay.npz")
    p.set_defaults(fn=cmd_seed_replay)

    p = sub.add_parser("play", help="interactive stdin game")
    p.set_defaults(fn=cmd_play)

    p = sub.add_parser("analyze", help="learning-curve + max-tile report")
    p.add_argument("--job", required=True)
    p.add_argument("--root", default="experiments")
    p.add_argument("--vs-reference", action="store_true",
                   help="side-by-side vs the reference's published "
                        "SSS_replay max-tile distribution")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("playback", help="replay a snapshotted game")
    p.add_argument("--job", required=True)
    p.add_argument("--root", default="experiments")
    p.add_argument("--episode", type=int, required=True)
    p.add_argument("--interactive", action="store_true")
    p.set_defaults(fn=cmd_playback)

    p = sub.add_parser("bench", help="throughput / MFU benchmarks")
    p.add_argument("--env-batch", type=int, default=8192)
    p.add_argument("--iters", type=int, default=2048)
    p.add_argument("--train", action="store_true",
                   help="bench the real training iteration across env batches")
    p.add_argument("--train-batches", type=int, nargs="+",
                   default=[64, 1024, 4096, 16384])
    p.add_argument("--breakdown", action="store_true",
                   help="per-stage timing of the training iteration")
    p.add_argument("--roofline", action="store_true",
                   help="VPU roofline of the Pallas env kernel")
    p.add_argument("--preset", default="conv")
    p.add_argument("--chunk-iters", type=int, default=256)
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
