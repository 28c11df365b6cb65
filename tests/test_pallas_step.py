"""Equivalence of the fused Pallas DMFB step kernel with the XLA step
(interpret mode on CPU; the XLA step is itself lockstep-verified against
the reference simulator, so equivalence transfers reference parity to the
kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import marl_dmfb_tpu.envs.dmfb as denv


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize("n_droplets,n_blocks", [(2, 0), (4, 2)])
def test_kernel_matches_xla_step(interpret_pallas, n_droplets, n_blocks):
    import marl_dmfb_tpu.ops.dmfb_step_pallas as pk

    params = denv.DMFBParams(width=10, length=10, n_droplets=n_droplets,
                             fov=9, n_blocks=n_blocks)
    B = 8
    states = jax.vmap(lambda k: denv.init(params, k))(
        jax.random.split(jax.random.PRNGKey(0), B)
    )
    # degrade some health so move-failure branches execute
    rng = np.random.RandomState(1)
    states = states._replace(
        health=jnp.asarray(rng.rand(B, 10, 10) * 0.5 + 0.5, jnp.float32)
    )
    for it in range(5):
        acts = jnp.asarray(rng.randint(0, 5, (B, n_droplets)), jnp.int32)
        unis = jnp.asarray(rng.rand(B, n_droplets), jnp.float32)
        s_ref, o_ref = jax.vmap(
            lambda s, a, u: denv.step_core(params, s, a, u)
        )(states, acts, unis)
        s_pal, o_pal = pk.pallas_step_batch(params, states, acts, unis)
        np.testing.assert_array_equal(np.array(s_ref.pos), np.array(s_pal.pos))
        np.testing.assert_array_equal(np.array(s_ref.dist), np.array(s_pal.dist))
        np.testing.assert_allclose(np.array(s_ref.usage), np.array(s_pal.usage),
                                   atol=1e-6)
        np.testing.assert_allclose(np.array(o_ref.rewards),
                                   np.array(o_pal.rewards), atol=1e-5)
        np.testing.assert_array_equal(np.array(o_ref.obs), np.array(o_pal.obs))
        np.testing.assert_array_equal(np.array(o_ref.dones), np.array(o_pal.dones))
        np.testing.assert_array_equal(np.array(o_ref.success),
                                      np.array(o_pal.success))
        np.testing.assert_array_equal(np.array(o_ref.constraints),
                                      np.array(o_pal.constraints))
        states = s_ref
