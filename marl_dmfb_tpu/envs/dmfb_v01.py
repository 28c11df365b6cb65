"""DMFB v0.1 observation variant (reference ``DMFBenv_v0_1.getOneObs``,
env/DMFB/dmfb.py:723-835): a 4-layer float FOV observation that adds the
agent's own goal layer and ray-projects other visible droplets' goals onto
the FOV border with an occupancy-fallback scatter, plus a normalized float
direction vector.

Implemented in round 1 as a placeholder; the base "v0" observation
(3-layer int8) is the primary trained configuration.
"""

from __future__ import annotations


def observe_one_v01(params, state, i, board_ids):  # pragma: no cover
    raise NotImplementedError(
        "DMFB obs v0.1 is not implemented yet; use obs_version='v0'"
    )
