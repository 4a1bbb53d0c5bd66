"""Evaluation players: random, up-left heuristic, greedy model."""

from t48.baselines.players import (
    Player,
    play_games,
    random_policy,
    upleft_policy,
    greedy_model_policy,
    basic_upleft_algorithm,
)

__all__ = [
    "Player",
    "play_games",
    "random_policy",
    "upleft_policy",
    "greedy_model_policy",
    "basic_upleft_algorithm",
]
