"""CLI: train / evaluate / export-demo / human / play / bench.

Flag-compatible with the reference's typer app (train.py:1284-2301) — same
option names and defaults — implemented with argparse (typer is not in this
image). Enabled paths the reference ships disabled: ``evaluate`` is
implemented (reference stub, train.py:1933-1943), ``train --model-type urm``
works (reference exits, train.py:1528-1532), resume works (reference exits on
``--model``, train.py:1508-1514).
"""

from __future__ import annotations

import argparse
import os


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    add = p.add_argument
    add("--steps", "-s", type=int, default=1000, help="Number of training steps")
    add("--model", "-m", dest="model_path", default=None,
        help="Resume training from a train-state checkpoint directory")
    add("--lr", dest="learning_rate", type=float, default=0.001)
    add("--gamma", type=float, default=0.99, help="Discount factor")
    add("--entropy", dest="entropy_strength", type=float, default=0.1)
    add("--critic", dest="critic_strength", type=float, default=1.0)
    add("--epsilon", type=float, default=1.0, help="(unused, kept for parity)")
    add("--momentum", type=float, default=0.99, help="(unused, kept for parity)")
    add("--episodes", dest="num_episodes", type=int, default=1)
    add("--batch-size", dest="batch_size", type=int, default=1)
    add("--epochs", dest="ppo_epochs", type=int, default=1)
    add("--workers", "-w", type=int, default=1,
        help="(unused: rollouts are batched on-device)")
    add("--max-steps", dest="max_steps", type=int, default=None)
    add("--hidden", "-H", dest="hidden_size", type=int, default=64)
    add("--num-layers", "-l", dest="num_layers", type=int, default=2)
    add("--model-type", "-t", dest="model_type", default="mlp")
    add("--num-heads", dest="num_heads", type=int, default=4)
    add("--num-loops", dest="num_loops", type=int, default=4)
    add("--truncated-loops", dest="num_truncated_loops", type=int, default=1)
    add("--print-freq", "-p", dest="print_frequency", type=int, default=10)
    add("--show-last-steps", dest="show_last_steps", type=int, default=0)
    add("--points", dest="points_weight", type=float, default=0.0)
    add("--smoothness", dest="smoothness_weight", type=float, default=0.0)
    add("--tile-bonus", dest="max_tile_weight", type=float, default=0.0)
    add("--corner", dest="corner_weight", type=float, default=0.0)
    add("--adjacency", dest="adjacency_weight", type=float, default=0.0)
    add("--chain", dest="chain_weight", type=float, default=0.0)
    add("--mono", dest="monotonicity_weight", type=float, default=0.0)
    add("--warmup-steps", dest="warmup_steps", type=int, default=200)
    add("--emptiness", dest="emptiness_weight", type=float, default=0.0)
    add("--topo", dest="topological_weight", type=float, default=0.0)
    add("--win-bonus", dest="win_bonus", type=float, default=0.0)
    add("--gpu", action="store_true",
        help="(accepted for parity; accelerator selection is JAX's)")
    add("--viz-dir", dest="viz_dir", default=None)
    add("--rtg-beta", dest="rtg_beta", type=float, default=0.9)
    add("--log-dir", dest="log_dir", default=None)
    add("--wandb", dest="use_wandb", action="store_true")
    add("--wandb-project", dest="wandb_project", default="2048-rl")
    add("--wandb-run", dest="wandb_run_name", default=None)
    add("--eval-freq", dest="eval_freq", type=int, default=None)
    add("--eval-games", dest="eval_games", type=int, default=100)
    add("--critic-lr", dest="critic_lr", type=float, default=0.001)
    add("--decouple-critic", dest="decouple_critic", action="store_true")
    add("--upsample-ratio", dest="upsample_ratio", type=float, default=0.0)
    add("--export-demo", dest="export_demo", action="store_true")
    add("--checkpoint-dir", dest="checkpoint_dir", default="checkpoints")
    add("--beta1", type=float, default=0.9)
    add("--beta2", type=float, default=0.999)
    add("--weight-decay", dest="weight_decay", type=float, default=0.01)
    add("--adaptive-beta", dest="adaptive_beta", action="store_true")
    add("--target-entropy", dest="target_entropy", type=float, default=0.7)
    add("--beta-min", dest="beta_min", type=float, default=0.001)
    add("--beta-max", dest="beta_max", type=float, default=1.0)
    add("--beta-lr", dest="beta_lr", type=float, default=0.01)
    # framework-native flags
    add("--seed", type=int, default=0, help="PRNG seed (framework-native)")
    add("--resume", action="store_true", help="Resume from checkpoint-dir")
    add("--no-kl-diagnostic", dest="kl_diagnostic", action="store_false",
        help="Skip the per-minibatch KL(old||new) extra forward")
    add("--scan-cap", dest="scan_cap", type=int, default=4096,
        help="Episode-length capacity of the fused rollout")
    add("--packed", action="store_true",
        help="Packed (auto-reset) rollout: persistent lanes advance a fixed "
             "number of steps per train step, finished games reset in-place "
             "and episodes cut at the chunk boundary are value-bootstrapped "
             "— 100%% lane occupancy (the throughput mode; exact-episodes "
             "rollout remains the default for reference curve parity)")
    add("--lanes", type=int, default=0,
        help="Packed mode: number of persistent env lanes (0 -> --episodes)")
    add("--horizon", type=int, default=512,
        help="Packed mode: env steps per lane per train step")
    add("--no-packed-capture", dest="packed_capture", action="store_false",
        default=True,
        help="Packed mode: disable the device-side best-episode recorder "
             "(algo/capture.py) that feeds printing/viz/demo export; saves "
             "lanes x scan-cap x 41 B of HBM at extreme lane counts")
    add("--checkpoint-freq", dest="checkpoint_freq", type=int, default=None)
    add("--mesh-data", dest="mesh_data", type=int, default=1,
        help="Data-parallel mesh size (>1 routes through the SPMD trainer)")
    add("--dropout", type=float, default=0.1)
    add("--eval-env-seed", dest="eval_env_seed", type=int, default=12345,
        help="Base seed of the env stream used by eval-in-train")
    add("--eval-fixed-stream", dest="eval_fixed_stream", action="store_true",
        help="Use the IDENTICAL eval spawn stream every round (reference-"
             "analog semantics) instead of folding the eval index into the "
             "env key")
    add("--no-pipeline", dest="pipeline", action="store_false", default=True,
        help="Disable host/device pipelining (finish each step's host work "
             "before dispatching the next step). Numerics are identical "
             "either way; pipelining only hides dispatch latency")
    add("--expert-iter", dest="expert_iter", action="store_true",
        help="Expert iteration: rollout with expectimax-search actions "
             "(critic leaves, live RTG-moment denormalization) and train the "
             "policy by imitation instead of PPO")
    add("--expert-depth", dest="expert_depth", type=int, default=1,
        choices=(1, 2), help="Search depth of the expert rollout")
    add("--expert-mix", dest="expert_mix", type=float, default=0.5,
        help="Fraction of envs the expert drives; the rest play the sampled "
             "policy (every state still gets an expert label — DAgger)")
    add("--expert-tau", dest="expert_tau", type=float, default=0.02,
        help="Soft-label temperature in return-std units "
             "(softmax(scores/(sigma*tau)); 0 = hard argmax labels)")
    add("--no-expert-sharp", dest="expert_sharp", action="store_false",
        default=True,
        help="Cross-entropy against the soft target itself instead of the "
             "default one-hot(argmax) with the soft decisiveness gap weight "
             "(the soft-CE variant measurably collapses solo sampled play)")
    add("--expert-src", dest="expert_src", default=None,
        help="Checkpoint dir of a FROZEN expert (params from best_model, "
             "coefs from its train_state moments). Unset = live learner "
             "drives the search, which couples teacher to student drift "
             "and measurably implodes; prefer a frozen src")
    add("--expert-bf16", dest="expert_bf16", action="store_true",
        help="Run the expert's search leaf forwards in bfloat16 (~2x expert "
             "rollout throughput; labels flip only on near-tie states whose "
             "CE weight the decisiveness gap already zeroes)")
    add("--anchor-kl", dest="anchor_kl", type=float, default=0.0,
        help="KL(anchor || pi) trust-region strength vs the run-start "
             "(warm-started) policy; guards distillation against trading "
             "away warm-start competence. 0 = off")
    # multi-host launch (SURVEY.md §5.8; net-new — the reference has no
    # distributed layer). Run the SAME command on every host with its own
    # --process-id; the mesh then spans all hosts' chips.
    add("--coordinator-address", dest="coordinator_address", default=None,
        help="host:port of process 0 (multi-host training)")
    add("--num-processes", dest="num_processes", type=int, default=None,
        help="Total number of hosts/processes in the job")
    add("--process-id", dest="process_id", type=int, default=None,
        help="This host's index in [0, num_processes)")
    add("--platform", default=None,
        help="Force a JAX platform (cpu/tpu) — e.g. cpu for multi-host tests")


def cmd_train(args) -> None:
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.num_processes and args.num_processes > 1:
        from ..parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from .loop import TrainConfig, train

    field_names = set(TrainConfig.__dataclass_fields__)
    kwargs = {k: v for k, v in vars(args).items() if k in field_names}
    if args.model_path:
        kwargs["resume"] = True
        kwargs["checkpoint_dir"] = args.model_path
    train(TrainConfig(**kwargs))


def _apply_platform(args) -> None:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def cmd_evaluate(args) -> None:
    _apply_platform(args)
    from .evaluate import evaluate_checkpoint

    if args.search and args.search_depth >= 3 and args.search_prune == 0:
        # The exact depth-3 tree is (4*32)^2 subproblems per move per board —
        # it hangs/OOMs long before producing a number. Force the documented
        # tractable default instead of silently wedging.
        print("--search-depth 3 without --search-prune is intractable "
              "(exact (4*32)^2 inner tree); forcing --search-prune 2. "
              "Pass --search-prune explicitly to override.")
        args.search_prune = 2
    evaluate_checkpoint(args.model_path, games=args.games, seed=args.seed,
                        greedy=args.greedy, env_seed=args.env_seed,
                        search=args.search, search_depth=args.search_depth,
                        search_prune=args.search_prune,
                        search_bf16=getattr(args, "search_bf16", False))


def cmd_export_demo(args) -> None:
    _apply_platform(args)
    from .evaluate import load_model_checkpoint
    from .export import export_demo_assets
    from .evaluate import play_best_of
    from pathlib import Path
    import json

    params, model_cfg, model_type = load_model_checkpoint(args.model_path)
    print(f"Model loaded (hidden_dim={model_cfg.hidden_dim}, "
          f"num_layers={model_cfg.num_layers})")
    if args.game_path:
        src = Path(args.game_path)
        data = json.loads(src.read_text())
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        demo = {"score": data.get("score", 0),
                "total_steps": data.get("total_steps", len(data.get("moves", []))),
                "moves": data.get("moves", [])}
        (out / "best_game.json").write_text(json.dumps(demo, indent=2))
        print(f"Game exported to {out / 'best_game.json'}")
        best = None
        play_meta = None
    elif args.search:
        from .evaluate import load_search_coefs, search_play_best

        coefs = load_search_coefs(args.model_path)
        print(f"Search play for demo export (depth={args.search_depth}, "
              f"coefs={coefs})")
        env_seed = args.seed if args.seed else 12345
        best = search_play_best(params, model_cfg, model_type,
                                num_games=args.num_games,
                                env_seed=env_seed,
                                coefs=coefs, depth=args.search_depth)
        play_meta = {"mode": "search", "search_depth": args.search_depth,
                     "num_games": args.num_games, "env_seed": env_seed}
    else:
        best = play_best_of(params, model_cfg, model_type,
                            num_games=args.num_games, seed=args.seed)
        play_meta = {"mode": "sampled", "num_games": args.num_games,
                     "seed": args.seed}
    from .evaluate import load_search_coefs as _lsc

    export_demo_assets(params, model_cfg, model_type, best, args.output_dir,
                       search_coefs=_lsc(args.model_path),
                       play_meta=play_meta)
    # Copy the raw checkpoint next to the demo assets (the reference copies
    # best_model.pt into docs/data, train.py:2064-2069).
    import shutil

    src_dir = Path(args.model_path)
    if src_dir.is_dir():
        name = ("best_model"
                if (src_dir / "best_model.npz").exists() else "train_state")
        for ext in (".npz", ".json"):
            src = src_dir / f"{name}{ext}"
            if src.exists():
                shutil.copy2(src, Path(args.output_dir) / f"best_model{ext}")
    print(f"\nDemo assets exported to {args.output_dir}/")
    print("To test locally: cd web && python -m http.server 8000")


def cmd_human(args) -> None:
    from .play_cli import human_play

    human_play()


def cmd_play(args) -> None:
    from .play_cli import watch_agent

    watch_agent(model_path=args.model_path, delay=args.delay, seed=args.seed,
                search=args.search)


def cmd_bench(args) -> None:
    import bench as _bench  # repo-root bench.py

    _bench.main()


def _enable_compilation_cache() -> None:
    """Persistent XLA compile cache: repeated CLI invocations with the same
    shapes skip recompilation (first TPU compile of the fused train step can
    take minutes on a slow host)."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/tpu2048-xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None) -> None:
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(
        prog="tpu2048", description="Train and evaluate 2048 AI agents (TPU-native)"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="Train an agent")
    _add_train_flags(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("evaluate", help="Evaluate a trained agent")
    p_eval.add_argument("model_path", help="Path to checkpoint directory or .npz")
    p_eval.add_argument("--games", "-g", type=int, default=100)
    p_eval.add_argument("--seed", type=int, default=0)
    p_eval.add_argument("--greedy", action="store_true",
                        help="Argmax actions instead of sampling")
    p_eval.add_argument("--env-seed", dest="env_seed", type=int, default=12345,
                        help="Seed of the fixed eval env stream")
    p_eval.add_argument("--platform", default=None,
                        help="Force a JAX platform (cpu/tpu)")
    p_eval.add_argument("--search", action="store_true",
                        help="Expectimax action selection (exact chance "
                             "nodes, critic leaves) instead of the raw policy")
    p_eval.add_argument("--search-depth", dest="search_depth", type=int,
                        default=1, choices=(1, 2, 3),
                        help="Max-node plies for --search (2 = exact 2-ply "
                             "tree, 4x32x4x32 leaves per board; 3 needs "
                             "--search-prune to be tractable)")
    p_eval.add_argument("--search-prune", dest="search_prune", type=int,
                        default=0, choices=(0, 1, 2, 3),
                        help="Expand only the top-k actions (ranked by 1-ply "
                             "score) at inner max nodes; 0 = exact tree. "
                             "Only takes effect at depth >= 3 (inner max "
                             "nodes don't exist below that); forced to 2 "
                             "when depth 3 is requested without it")
    p_eval.add_argument("--search-bf16", dest="search_bf16",
                        action="store_true",
                        help="Run the search's critic leaf forwards in "
                             "bfloat16 (~2x ms/move at depth 3; the "
                             "expert_bf16 lever applied to eval — flips "
                             "only near-tie action choices)")
    p_eval.set_defaults(fn=cmd_evaluate)

    p_exp = sub.add_parser("export-demo", help="Export demo assets for the web UI")
    p_exp.add_argument("--model", "-m", dest="model_path",
                       default="checkpoints", help="Checkpoint dir")
    p_exp.add_argument("--game", "-g", dest="game_path", default=None)
    p_exp.add_argument("--output", "-o", dest="output_dir", default="web/data")
    p_exp.add_argument("--num-games", "-n", dest="num_games", type=int, default=10)
    p_exp.add_argument("--gpu", action="store_true")
    p_exp.add_argument("--batch-size", "-b", type=int, default=32)
    p_exp.add_argument("--seed", type=int, default=0)
    p_exp.add_argument("--platform", default=None,
                       help="Force a JAX platform (cpu/tpu)")
    p_exp.add_argument("--search", action="store_true",
                       help="Generate the showcase game with expectimax "
                            "search play instead of sampled policy play")
    p_exp.add_argument("--search-depth", dest="search_depth", type=int,
                       default=2, choices=(1, 2))
    p_exp.set_defaults(fn=cmd_export_demo)

    p_human = sub.add_parser("human", help="Play 2048 yourself (WASD/arrows)")
    p_human.set_defaults(fn=cmd_human)

    p_play = sub.add_parser("play", help="Watch an agent play")
    p_play.add_argument("--model", "-m", dest="model_path", default=None)
    p_play.add_argument("--delay", "-d", type=float, default=0.5)
    p_play.add_argument("--seed", type=int, default=0)
    p_play.add_argument("--search", type=int, default=0, choices=(0, 1, 2),
                        help="Expectimax move selection of this depth "
                             "(0 = sample the policy)")
    p_play.set_defaults(fn=cmd_play)

    p_bench = sub.add_parser("bench", help="Run the throughput benchmark")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
