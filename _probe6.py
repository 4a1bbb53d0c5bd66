"""Trace one full training chunk and dump top HLO ops by self time."""
import glob, os, sys, jax
from t48.configs import get_preset
from t48.train import loop as loop_lib

cfg = get_preset("conv", env_batch=4096, chunk_iters=256,
                 replay_buffer_length=16384,
                 no_episodes_before_training=0, seed=0)
state = loop_lib.create_train_state(cfg)
chunk = loop_lib.make_train_chunk(cfg)
state, _ = chunk(state)  # compile + warm
jax.block_until_ready(state.env.boards)

logdir = "/tmp/t48_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state, _ = chunk(state)
    jax.block_until_ready(state.env.boards)

files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
