"""On-device batched episode metrics (SURVEY.md §5.5).

The reference reports per-episode stats with Python accumulators in main()
(soccer_simultaneous_env.py:569-613); here aggregation happens on device
over whole rollout chunks — one reduction per chunk, no host transfers in
the hot loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.batch import StepOut


class EpisodeStats(NamedTuple):
    episodes: jnp.ndarray     # finished episodes in the chunk
    goals: jnp.ndarray        # episodes ending in a goal
    truncations: jnp.ndarray
    wins_a: jnp.ndarray       # goals with A-perspective reward > 0
    wins_b: jnp.ndarray
    mean_reward_a: jnp.ndarray  # mean terminal reward over finished episodes
    mean_length: jnp.ndarray    # env-steps per finished episode

    def merge(self, other: "EpisodeStats") -> "EpisodeStats":
        n1, n2 = self.episodes, other.episodes
        tot = n1 + n2
        wavg = lambda a, b: jnp.where(tot > 0, (a * n1 + b * n2) / tot, 0.0)
        return EpisodeStats(
            episodes=tot, goals=self.goals + other.goals,
            truncations=self.truncations + other.truncations,
            wins_a=self.wins_a + other.wins_a,
            wins_b=self.wins_b + other.wins_b,
            mean_reward_a=wavg(self.mean_reward_a, other.mean_reward_a),
            mean_length=wavg(self.mean_length, other.mean_length),
        )


def chunk_stats(out: StepOut) -> EpisodeStats:
    """Aggregate a stacked rollout chunk ([T, B] leaves) on device."""
    term = out.done | out.truncated
    episodes = term.sum()
    goals = out.done.sum()
    total_steps = out.done.size  # every env advances one step per tick
    safe = jnp.maximum(episodes, 1)
    return EpisodeStats(
        episodes=episodes,
        goals=goals,
        # exclusive of goals so goals + truncations == episodes
        truncations=(out.truncated & ~out.done).sum(),
        wins_a=(out.done & (out.reward_a > 0)).sum(),
        wins_b=(out.done & (out.reward_a < 0)).sum(),
        mean_reward_a=jnp.where(
            episodes > 0, out.reward_a.sum() / safe, 0.0),
        mean_length=jnp.where(
            episodes > 0, total_steps / safe, 0.0),
    )
