"""
Console entry point for training/evaluation (reference main.py:16-125,
CLI-compatible).  Root-level ``main.py`` delegates here so the reference's
``python main.py --operator X --model_type Y`` invocations and the installed
``quanonet-train`` console script share one implementation.

All model families train through the single JAX solver; the reference's
--quantum_backend / --classical_backend flags are accepted so its reproduce
scripts run unchanged, but every value resolves to the one TPU engine
(the reference's 5-way dispatch, utils/backend.py:49-129, is collapsed by
design — SURVEY.md §7).
"""
import sys

from quanonet_tpu.config import get_base_parser, load_config, set_random_seed


def main(argv=None):
    parser = get_base_parser()
    args = parser.parse_args(argv)
    config = load_config(args)

    model_type = config['model_type']
    print("\n===========================================================")
    print(f" QuanONet-TPU Launcher | Model: {model_type} | "
          f"Operator: {config['operator']}")
    print(f" Engine: JAX/XLA ({config.get('engine', 'auto')}) — "
          f"backend flags accepted for script compat: "
          f"q={config.get('quantum_backend')}, c={config.get('classical_backend')}")
    print("===========================================================")

    set_random_seed(config.get('seed', 0))

    if config.get('multi_seed'):
        from quanonet_tpu.multiseed import train_multi_seed
        try:
            train_multi_seed(config)
            print("\nExecution Finished Successfully.")
        except Exception as e:
            print(f"\nExecution Failed: {e}")
            import traceback
            traceback.print_exc()
            sys.exit(1)
        return

    from quanonet_tpu.solver import Solver
    try:
        solver = Solver(config)
    except Exception as e:
        print(f"Initialization Failed: {e}")
        import traceback
        traceback.print_exc()
        sys.exit(1)

    try:
        history = solver.train()
        solver.evaluate(history)
        print("\nExecution Finished Successfully.")
    except KeyboardInterrupt:
        print("\nInterrupted by user.")
    except SystemExit:
        raise
    except Exception as e:
        print(f"\nExecution Failed: {e}")
        import traceback
        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
