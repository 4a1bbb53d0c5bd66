"""t48 — a TPU-native 2048 reinforcement-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
project ``ribal-aladeeb/reinforcement-learning-2048`` (a single-process
CPU/CUDA PyTorch Double-DQN for 2048), redesigned TPU-first:

- ``t48.env``      — pure-JAX batched 2048 engine (thousands of boards in
                     lockstep under ``jit``) + a CPU golden model reproducing
                     the reference's exact semantics and RNG streams
                     (reference: src/board.py).
- ``t48.agent``    — dense/conv Q-networks, ε-greedy policy with legality
                     masking, Double-DQN loss (reference: src/dqn_lib.py,
                     src/configs/*.py).
- ``t48.replay``   — HBM-resident circular replay buffer, tensorized at
                     insert (reference: the deque at src/dqn_lib.py:172).
- ``t48.train``    — on-device actor-learner loop with per-episode schedule
                     semantics (reference: src/dqn_lib.py:167-244).
- ``t48.search``   — host-side best-first search + A*-seeded replay
                     (reference: src/state_space_search.py).
- ``t48.distrib``  — device mesh / NamedSharding runtime, data-parallel
                     learner with psum gradient collectives (net-new; the
                     reference is single-device, src/device/__init__.py).
- ``t48.exp``      — experiment persistence, full-state checkpoint/resume,
                     metrics (reference: src/experiments.py).
- ``t48.baselines``— random / up-left / greedy evaluation players
                     (reference: src/player.py, src/board.py:244-261).
- ``t48.analysis`` — learning-curve / max-tile reports (reference:
                     experiments/*.ipynb, notebook_utils.py).
- ``t48.configs``  — presets mirroring the reference's three configs.
- ``t48.cli``      — train / play / evaluate / seed-replay / bench entry
                     points.
"""

__version__ = "0.1.0"
