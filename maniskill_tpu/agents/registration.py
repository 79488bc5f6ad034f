"""Agent registry (counterpart of mani_skill/agents/registration.py)."""
from __future__ import annotations

from typing import Dict, Type

REGISTERED_AGENTS: Dict[str, Type] = {}


def register_agent(override: bool = False, **kwargs):
    def _register(cls):
        uid = cls.uid
        if uid in REGISTERED_AGENTS and not override:
            raise ValueError(f"agent {uid} already registered")
        REGISTERED_AGENTS[uid] = cls
        return cls

    return _register


def get_agent_class(uid: str):
    if uid not in REGISTERED_AGENTS:
        raise KeyError(f"agent {uid} not registered; known: {sorted(REGISTERED_AGENTS)}")
    return REGISTERED_AGENTS[uid]
