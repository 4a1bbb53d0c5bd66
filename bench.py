#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Runs the batched 2048 env rollout (the trainer's actor path) on the real
TPU chip and reports env-steps/s vs the reference's ~40 steps/s
(BASELINE.md: 17,758 episodes in 17h48m at ~144 steps/episode).
"""

import json
import sys


def main() -> int:
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
