"""Host-side state-space search and replay seeding."""

from t48.search.astar import Node, best_first_search
from t48.search.seeding import generate_replay_transitions

__all__ = ["Node", "best_first_search", "generate_replay_transitions"]
