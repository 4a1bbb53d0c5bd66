import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from t48.configs import get_preset
from t48.train.trainer import train

cfg = get_preset("conv", env_batch=16384, chunk_iters=256,
                 replay_buffer_length=65536, no_episodes=400_000,
                 no_episodes_before_training=700, seed=0,
                 snapshot_game_every_n_episodes=100_000)
t0 = time.time()
state, exp = train(cfg, root_dir="/tmp/sustained", job_name="b16384_sustained",
                   verbose=False)
wall = time.time() - t0
with open(exp.folder + "/text/hyperparams.json") as f:
    hp = json.load(f)
out = {
    "config": "conv preset, env_batch=16384, chunk_iters=256, max_updates=1",
    "episodes": int(state.episodes_done),
    "env_steps": int(state.env_steps),
    "train_steps": int(state.train_steps),
    "wall_s_total_incl_compile": round(wall, 1),
    "throughput_steady": hp["throughput"],
}
with open("benchmarks/sustained_r03.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
