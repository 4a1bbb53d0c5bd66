"""Config presets mirroring the reference's three experiment configs."""

from t48.configs.presets import (
    T48Config,
    double_dqn_dense,
    double_dqn_conv,
    double_dqn_conv_sss,
    get_preset,
    PRESETS,
)

__all__ = [
    "T48Config",
    "double_dqn_dense",
    "double_dqn_conv",
    "double_dqn_conv_sss",
    "get_preset",
    "PRESETS",
]
