#!/usr/bin/env python
"""Round-5: capture a committed profiler trace of flagship train chunks.

VERDICT r04 weak #5: `utils/tracing.profile_session` backs the PARITY
tracing claim but no committed artifact demonstrated a captured trace —
everything committed was derived timing JSON. This script runs the
exact-batch flagship chunk (env_batch=2560, batch 5000, while-mode
learner, Pallas env kernel) on the real chip and captures a few chunks
under `jax.profiler` with named step annotations, then copies the
resulting xplane protobuf (size-trimmed: the one file TensorBoard /
xprof reads) into benchmarks/traces/.

Run: PYTHONPATH=/root/.axon_site:. python scripts/trace_capture_r05.py
"""

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from t48.configs import get_preset
from t48.train import loop as loop_lib
from t48.utils.tracing import profile_session, step_annotation


def main():
    out_dir = "benchmarks/traces"
    os.makedirs(out_dir, exist_ok=True)
    tmp = "/tmp/t48_trace"
    shutil.rmtree(tmp, ignore_errors=True)

    cfg = get_preset(
        "sss_published",
        env_batch=2560,
        max_updates_per_iteration=25,
        no_episodes_before_training=0,
        use_astar_seed=False,
        chunk_iters=32,
        seed=0,
    )
    assert loop_lib.resolve_env_backend(cfg) == "pallas"
    state = loop_lib.create_train_state(cfg)
    chunk = loop_lib.make_train_chunk(cfg)
    # warm: compile + fill replay so the traced chunks are steady-state
    for _ in range(4):
        state, _ = chunk(state)
    jax.block_until_ready(state.params)

    with profile_session(tmp):
        for i in range(2):
            with step_annotation("train_chunk", i):
                state, _ = chunk(state)
        jax.block_until_ready(state.params)

    # the xplane protobuf is the trace; copy the newest one
    planes = sorted(
        glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert planes, f"no xplane captured under {tmp}"
    src = planes[-1]
    dst = os.path.join(out_dir, "flagship_chunk_r05.xplane.pb")
    shutil.copy(src, dst)
    meta = {
        "config": "sss_published b2560 u25 chunk_iters=32, Pallas env",
        "chunks_captured": 2,
        "device": str(jax.devices()[0]),
        "episodes_after": int(state.episodes_done),
        "updates_after": int(state.train_steps),
        "source_file": os.path.basename(src),
        "size_bytes": os.path.getsize(dst),
        "how_to_view": "TensorBoard profile plugin or xprof; the xplane "
                       "protobuf is the device+host timeline",
    }
    with open(os.path.join(out_dir, "flagship_chunk_r05.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
