"""A*-seeded (SSS) training end-to-end on the tiny scale."""

import os

import numpy as np

from t48.configs import get_preset
from t48.train.trainer import train


def test_sss_training_e2e(tmp_path):
    cfg = get_preset(
        "conv_sss",
        env_batch=8,
        batch_size=32,
        replay_buffer_length=2048,
        no_episodes=15,
        no_episodes_before_training=2,
        chunk_iters=32,
        episode_log_size=256,
        astar_games=2,
        astar_max_expansions=300,
    )
    state, exp = train(cfg, root_dir=str(tmp_path), job_name="sss", verbose=False)
    assert int(state.episodes_done) >= 15
    # the replay buffer was warm-started before any env steps ran:
    # seeded transitions have search-path rewards recorded
    assert int(state.replay.fill) > 0
    assert int(state.train_steps) > 0
    assert os.path.isfile(exp.checkpoint_path)


def test_sss_preset_values():
    """conv_sss mirrors configs/double_dqn_sss.py: conv net, replay 100k,
    50k episodes, with the warm-start enabled."""
    cfg = get_preset("double_dqn_conv_sss")
    assert cfg.arch == "conv"
    assert cfg.replay_buffer_length == 100_000
    assert cfg.no_episodes == 50_000
    assert cfg.use_astar_seed


def test_enum_config_fields_validated():
    """Typos in enum-like knobs fail loudly instead of silently picking
    the other behavior (r04 review finding)."""
    import pytest

    from t48.configs import get_preset

    for field, bad in [
        ("learner_update_mode", "whil"),
        ("episode_retention", "steam"),
        ("env_backend", "cuda"),
        ("policy_compat", "strict"),
        ("compute_dtype", "float64"),
    ]:
        with pytest.raises(ValueError, match=field):
            get_preset("conv", **{field: bad})
