"""Agent networks and mixers, TPU-native Flax re-designs.

Capability parity with the reference nets (``network/base_net.py``,
``network/vdn_net.py``, ``network/qmix_net.py``) with the same architecture
hyperparameters, but idiomatic JAX:

* a single fused forward per timestep over the flattened ``(batch*agents)``
  axis — large matmuls for the MXU instead of per-agent Python loops;
* convolutions NHWC/VALID (XLA's native TPU conv layout);
* parameter init matches torch's default U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  so learning curves are comparable within seed variance.

The recurrent cell math matches ``torch.nn.GRUCell`` exactly
(r/z/n gates, reset applied inside the candidate's hidden branch).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _mm(x: jax.Array, w: jax.Array, dtype) -> jax.Array:
    """Matmul with optional reduced-precision compute: inputs cast to
    ``dtype`` (e.g. bfloat16 — the MXU's native format), result upcast to
    float32.  Params stay float32 throughout (standard mixed precision).
    The multiply runs uniformly in ``dtype`` — mixing dtypes via
    ``preferred_element_type`` breaks the conv/dot transpose rules (the f32
    cotangent meets a bf16 saved operand in the VJP); the MXU still
    accumulates bf16 products in float32 internally."""
    if dtype is None:
        return x @ w
    return (x.astype(dtype) @ w.astype(dtype)).astype(jnp.float32)


def _torch_uniform(fan_in: int):
    """torch's default kaiming-uniform-ish init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchGRUCell(nn.Module):
    """GRU cell with torch.nn.GRUCell gate math and init.

    h' = (1-z) * n + z * h, with
    r = sigmoid(x Wir + bir + h Whr + bhr)
    z = sigmoid(x Wiz + biz + h Whz + bhz)
    n = tanh(x Win + bin + r * (h Whn + bhn))
    """

    hidden: int
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        H = self.hidden
        init = _torch_uniform(H)  # torch uses 1/sqrt(hidden) for ALL gru params
        wi = self.param("wi", init, (x.shape[-1], 3 * H))
        wh = self.param("wh", init, (H, 3 * H))
        bi = self.param("bi", init, (3 * H,))
        bh = self.param("bh", init, (3 * H,))
        gi = _mm(x, wi, self.compute_dtype) + bi
        gh = _mm(h, wh, self.compute_dtype) + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class TorchDense(nn.Module):
    """Linear layer with torch's default init."""

    features: int
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        init = _torch_uniform(fan_in)
        w = self.param("w", init, (fan_in, self.features))
        b = self.param("b", init, (self.features,))
        return _mm(x, w, self.compute_dtype) + b


class TorchConv(nn.Module):
    """VALID 3x3 conv (NHWC) with torch's default init."""

    features: int
    stride: int = 1
    compute_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        fan_in = in_ch * 9
        init = _torch_uniform(fan_in)
        w = self.param("w", init, (3, 3, in_ch, self.features))
        b = self.param("b", init, (self.features,))
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            w = w.astype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.astype(jnp.float32) + b


def conv_plan(fov: int) -> Sequence[int]:
    """Stride plan per FOV (reference ``conv_str``, base_net.py:23-33):
    each entry is one 3x3 conv's stride."""
    plans = {5: (1,), 7: (1, 1), 9: (1, 1), 11: (1, 1), 13: (1, 1),
             19: (2, 1, 1)}
    if fov not in plans:
        raise ValueError(f"no conv plan for fov={fov}")
    return plans[fov]


def conv_out_size(fov: int) -> int:
    size = fov
    for s in conv_plan(fov):
        size = (size - 3) // s + 1
    return size


class RNNAgent(nn.Module):
    """fc -> GRU -> fc Q head (reference ``RNN``, base_net.py:7-21).

    Split into ``encode`` / ``gru_step`` / ``q_head`` so the learner can
    batch the time-independent parts over ALL timesteps at once and scan
    only the recurrent cell (see qlearn.unroll) — same params, same math,
    MXU-sized matmuls instead of T tiny ones."""

    n_actions: int
    rnn_hidden: int = 128
    compute_dtype: Optional[Any] = None

    def setup(self):
        dt = self.compute_dtype
        self.fc1 = TorchDense(self.rnn_hidden, name="fc1", compute_dtype=dt)
        self.gru = TorchGRUCell(self.rnn_hidden, name="gru", compute_dtype=dt)
        self.fc2 = TorchDense(self.n_actions, name="fc2", compute_dtype=dt)

    def encode(self, inputs: jax.Array) -> jax.Array:
        return nn.relu(self.fc1(inputs))

    def gru_step(self, x: jax.Array, h: jax.Array) -> jax.Array:
        return self.gru(x, h)

    def q_head(self, h: jax.Array) -> jax.Array:
        return self.fc2(h)

    def __call__(self, inputs: jax.Array, h: jax.Array):
        h = self.gru_step(self.encode(inputs), h)
        return self.q_head(h), h


class CRNNAgent(nn.Module):
    """Conv stack over the FOV image + MLP over the direction/last-action
    vector -> GRU -> Q head (reference ``CRNN``, base_net.py:35-71).

    Input layout (matching the reference flat episode tensors):
    ``[pixel (C*fov*fov) | direction (2) | last_action_onehot (n_actions)]``.
    """

    n_actions: int
    obs_channels: int      # C (3 or 4)
    fov: int
    conv_channels: int     # = args.hyper_hidden_dim in the reference (quirk)
    rnn_hidden: int = 128
    vec_len: int = 2
    compute_dtype: Optional[Any] = None

    def setup(self):
        dt = self.compute_dtype
        self.convs = [
            TorchConv(self.conv_channels, stride, name=f"conv{i+1}",
                      compute_dtype=dt)
            for i, stride in enumerate(conv_plan(self.fov))
        ]
        self.mlp1 = TorchDense(10, name="mlp1", compute_dtype=dt)
        self.gru = TorchGRUCell(self.rnn_hidden, name="gru", compute_dtype=dt)
        self.fc1 = TorchDense(self.n_actions, name="fc1", compute_dtype=dt)

    def encode(self, inputs: jax.Array) -> jax.Array:
        """Time-independent feature path (convs + vec MLP) — batchable
        over all timesteps at once in the learner."""
        C, fov = self.obs_channels, self.fov
        pix_len = C * fov * fov
        pixel = inputs[..., :pix_len]
        vec = inputs[..., pix_len:]
        # NCHW in the flat layout -> NHWC for the TPU conv
        pixel = pixel.reshape((-1, C, fov, fov)).transpose(0, 2, 3, 1)
        for conv in self.convs:
            pixel = nn.relu(conv(pixel))
        out = conv_out_size(fov)
        pixel = pixel.transpose(0, 3, 1, 2).reshape(
            (-1, out * out * self.conv_channels)
        )
        vec = nn.relu(self.mlp1(vec))
        return jnp.concatenate([pixel, vec], axis=-1)

    def gru_step(self, x: jax.Array, h: jax.Array) -> jax.Array:
        return self.gru(x, h)

    def q_head(self, h: jax.Array) -> jax.Array:
        return self.fc1(h)

    def __call__(self, inputs: jax.Array, h: jax.Array):
        h = self.gru_step(self.encode(inputs), h)
        return self.q_head(h), h

    # NOTE (round-4 refuted optimization): a ``step_split`` method taking
    # (raw int8 obs, last-action onehot) separately — skipping the
    # concatenated-f32-input materialization in the actor scan — was
    # implemented, equivalence-tested bitwise, and measured on the v5e:
    # runtime -2% (net-only scan 90.9 vs 92.8 ms at 65536 rows) but the
    # int8 loop operand made XLA:TPU compile blow up 28x (139 s net-only;
    # the full fused rollout did not finish compiling in 27 minutes).
    # Removed; the actor keeps the single concatenated input.  RESULTS.md
    # "Actor roofline (round 4)".


def build_agent_net(args) -> nn.Module:
    """Pick the agent net from config (reference policy/vdn.py:20-25).

    ``args.compute_dtype == "bf16"`` enables mixed precision (bfloat16
    matmuls/convs on the MXU, float32 params + accumulation); the default
    float32 keeps exact transplant parity with the reference torch nets."""
    dt = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(
        getattr(args, "compute_dtype", "float32"), None
    )
    if args.net == "rnn":
        return RNNAgent(n_actions=args.n_actions,
                        rnn_hidden=args.rnn_hidden_dim, compute_dtype=dt)
    elif args.net == "crnn":
        return CRNNAgent(
            n_actions=args.n_actions,
            obs_channels=args.obs_shape[0],
            fov=args.fov,
            conv_channels=args.hyper_hidden_dim,
            rnn_hidden=args.rnn_hidden_dim,
            vec_len=args.obs_shape[-2],
            compute_dtype=dt,
        )
    raise ValueError(f"unknown net: {args.net!r}")


class Critic(nn.Module):
    """Central-V critic MLP (reference base_net.py:115-127 — unused by the
    reference main path; provided for surface completeness)."""

    critic_dim: int = 128

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        x = nn.relu(TorchDense(self.critic_dim, name="fc1")(inputs))
        x = nn.relu(TorchDense(self.critic_dim, name="fc2")(x))
        return TorchDense(1, name="fc3")(x)


def vdn_mix(agent_qs: jax.Array) -> jax.Array:
    """Additive joint Q (reference VDNNet, vdn_net.py:9-10): sum over the
    agent axis, keepdims."""
    return jnp.sum(agent_qs, axis=2, keepdims=True)


class QMixer(nn.Module):
    """State-conditioned monotonic mixer (reference QMixNet,
    qmix_net.py:6-58), two-hypernet-layer variant per the shipped YAMLs."""

    n_agents: int
    state_dim: int
    qmix_hidden: int = 32
    hyper_hidden: int = 32
    two_hyper_layers: bool = True

    @nn.compact
    def __call__(self, agent_qs: jax.Array, states: jax.Array) -> jax.Array:
        # agent_qs: (b, T, n); states: (b, T, state_dim)
        b, T, n = agent_qs.shape
        q = agent_qs.reshape(-1, 1, n)
        s = states.reshape(-1, self.state_dim)
        if self.two_hyper_layers:
            w1 = TorchDense(self.n_agents * self.qmix_hidden, name="hyper_w1_2")(
                nn.relu(TorchDense(self.hyper_hidden, name="hyper_w1_1")(s))
            )
            w2 = TorchDense(self.qmix_hidden, name="hyper_w2_2")(
                nn.relu(TorchDense(self.hyper_hidden, name="hyper_w2_1")(s))
            )
        else:
            w1 = TorchDense(self.n_agents * self.qmix_hidden, name="hyper_w1")(s)
            w2 = TorchDense(self.qmix_hidden, name="hyper_w2")(s)
        b1 = TorchDense(self.qmix_hidden, name="hyper_b1")(s)
        b2 = TorchDense(1, name="hyper_b2_2")(
            nn.relu(TorchDense(self.qmix_hidden, name="hyper_b2_1")(s))
        )
        w1 = jnp.abs(w1).reshape(-1, n, self.qmix_hidden)
        w2 = jnp.abs(w2).reshape(-1, self.qmix_hidden, 1)
        hidden = nn.elu(jnp.einsum("bin,bnh->bih", q, w1) + b1[:, None, :])
        q_total = jnp.einsum("bih,bho->bio", hidden, w2) + b2[:, None, :]
        return q_total.reshape(b, T, 1)
