"""Agent Q-networks and value-decomposition mixers (Flax)."""

from marl_dmfb_tpu.models.networks import (
    RNNAgent,
    CRNNAgent,
    QMixer,
    vdn_mix,
    build_agent_net,
)

__all__ = ["RNNAgent", "CRNNAgent", "QMixer", "vdn_mix", "build_agent_net"]
