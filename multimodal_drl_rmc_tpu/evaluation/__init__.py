"""Offline evaluation: artifact parsers (reference evaluation/parsers.py)."""

from .parsers import (
    get_route_type,
    parse_framework_log,
    parse_sumo_log,
    parse_tripinfo_for_episode_stats,
)

__all__ = [
    "get_route_type",
    "parse_framework_log",
    "parse_sumo_log",
    "parse_tripinfo_for_episode_stats",
]
