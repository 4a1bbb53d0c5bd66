#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Runs the batched 2048 env rollout (the trainer's actor path) on the real
TPU chip and reports env-steps/s vs the reference's ~40 steps/s
(BASELINE.md: 17,758 episodes in 17h48m at ~144 steps/episode).
"""

import json
import os
import sys


def _enable_compile_cache() -> None:
    """Persistent XLA/Mosaic compilation cache: the Pallas rollout kernel
    takes many minutes to compile through the remote compile service, but
    a cached executable loads in seconds across processes."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> int:
    _enable_compile_cache()
    from t48.analysis.bench import run_headline_bench

    result = run_headline_bench()
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
