"""Per-agent action-selection facade (reference ``agent/agent.py``).

A stateful convenience wrapper mirroring the reference ``Agents`` API for
drop-in migration and interactive use: ``choose_action`` runs one GRU step
for one agent (maintaining ``eval_hidden`` per agent like agent.py:33-41),
``train`` dispatches a batch to the VDN/QMIX learner (agent.py:63-70).

The hot paths of this framework do NOT go through this class — training
uses the fused on-device rollout/learner (marl_dmfb_tpu.rollout /
algos.qlearn); this facade exists for API-surface parity and notebooks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from marl_dmfb_tpu.algos.qlearn import make_learner


class Agents:
    def __init__(self, args, env=None):
        if args.alg not in ("vdn", "qmix"):
            raise Exception("No such algorithm")  # agent.py:18-19
        self.args = args
        self.n_actions = args.n_actions
        self.n_agents = args.n_agents
        (self.init_learner, self.learn, self.net, self.learn_many,
         self.loss_fn) = make_learner(args, env)
        self.learner_state = self.init_learner(jax.random.PRNGKey(args.seed))
        self.eval_hidden = None
        self.init_hidden(1)
        self._rng = np.random.RandomState(args.seed)

        @jax.jit
        def _forward(params, inputs, hidden):
            q, h = self.net.apply({"params": params}, inputs, hidden)
            return q, h

        self._forward = _forward

    # -- reference policy surface --------------------------------------
    def init_hidden(self, episode_num: int):
        """(vdn.py:198-203)"""
        self.eval_hidden = jnp.zeros(
            (episode_num, self.n_agents, self.args.rnn_hidden_dim)
        )

    def choose_action(self, obs, last_action, agent_num, avail_actions,
                      epsilon, evaluate=False):
        """One agent's epsilon-greedy action (agent.py:22-48)."""
        inputs = np.asarray(obs, np.float32)
        if self.args.last_action:
            inputs = np.hstack([inputs, np.asarray(last_action, np.float32)])
        hidden = self.eval_hidden[:, agent_num, :]
        q, h = self._forward(
            self.learner_state.params["agent"],
            jnp.asarray(inputs)[None, :], hidden,
        )
        self.eval_hidden = self.eval_hidden.at[:, agent_num, :].set(h)
        avail = np.asarray(avail_actions, np.float32)
        q = np.where(avail == 0.0, -np.inf, np.asarray(q[0]))
        if self._rng.uniform() < epsilon and not evaluate:
            return int(self._rng.choice(np.nonzero(avail)[0]))
        return int(np.argmax(q))

    def train(self, batch: dict, train_step: int, epsilon=None):
        """Train on a reference-layout episode batch (agent.py:63-70).

        Accepts either this framework's episode schema (o_ext, ...) or the
        reference's (o, o_next, avail_u, u_onehot, ...), converting the
        latter; the masked loss is identical either way."""
        batch = dict(batch)
        if "o_ext" not in batch:
            o = jnp.asarray(batch.pop("o"))
            o_next = jnp.asarray(batch.pop("o_next"))
            batch["o_ext"] = jnp.concatenate(
                [o, o_next[:, -1:]], axis=1
            )
            for k in ("avail_u", "avail_u_next", "u_onehot"):
                batch.pop(k, None)
        keep = {"o_ext", "u", "r", "padded", "terminated", "s_ext"}
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
        self.learner_state, loss = self.learn(self.learner_state, batch)
        return float(loss)
