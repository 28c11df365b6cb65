"""Return computations: TD(λ) targets.

JAX equivalent of the reference's ``td_lambda_target``
(common/utils.py:33-79 — COMA leftover, dead in the reference main path but
part of its utility surface).  Semantics preserved: n-step returns masked by
padding, bootstrapping gated by (1 - terminated), λ-mixing with the final
tail term; implemented as a reverse ``lax.scan`` instead of the reference's
O(T²) Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def td_lambda_target(batch: dict, q_targets: jax.Array, gamma: float,
                     td_lambda: float, n_agents: int) -> jax.Array:
    """λ-returns, shape (b, T, n_agents).

    batch: dict with r (b,T,1), padded (b,T,1), terminated (b,T,1);
    q_targets: (b, T, n_agents).
    """
    mask = (1.0 - batch["padded"].astype(jnp.float32))            # (b,T,1)
    not_term = (1.0 - batch["terminated"].astype(jnp.float32))
    r = batch["r"].astype(jnp.float32)

    mask_a = jnp.repeat(mask, n_agents, axis=2)
    not_term_a = jnp.repeat(not_term, n_agents, axis=2)
    r_a = jnp.repeat(r, n_agents, axis=2)

    # G^λ_t = mask_t * (r_t + γ [ (1-λ) q_{t} nt_t + λ G^λ_{t+1} ])
    # matches the reference's mixed n-step sum with the tail-term closure.
    def step(carry, xs):
        g_next = carry
        r_t, q_t, m_t, nt_t = xs
        one_step = q_t * nt_t
        g_t = m_t * (r_t + gamma * ((1.0 - td_lambda) * one_step
                                    + td_lambda * g_next))
        return g_t, g_t

    xs = (
        jnp.moveaxis(r_a, 1, 0),
        jnp.moveaxis(q_targets, 1, 0),
        jnp.moveaxis(mask_a, 1, 0),
        jnp.moveaxis(not_term_a, 1, 0),
    )
    # Boundary: the reference's closure puts the residual λ-mass on the
    # longest n-step return; initializing the carry with the final
    # bootstrap q_{T-1}*(1-term) makes G_{T-1} == R^(1)_{T-1} exactly.
    g_last = q_targets[:, -1] * not_term_a[:, -1]
    _, gs = lax.scan(step, g_last, xs, reverse=True)
    return jnp.moveaxis(gs, 0, 1)
