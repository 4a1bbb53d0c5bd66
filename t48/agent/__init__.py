"""Q-networks, ε-greedy policy and Double-DQN learner."""

from t48.agent.networks import DenseQNet, ConvQNet, build_network
from t48.agent.policy import epsilon_greedy, greedy_masked_action
from t48.agent.learner import (
    double_dqn_targets,
    vanilla_dqn_targets,
    td_loss,
    make_train_step,
)

__all__ = [
    "DenseQNet",
    "ConvQNet",
    "build_network",
    "epsilon_greedy",
    "greedy_masked_action",
    "double_dqn_targets",
    "vanilla_dqn_targets",
    "td_loss",
    "make_train_step",
]
