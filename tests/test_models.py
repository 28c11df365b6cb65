"""Network parity tests: transplant torch weights from the REFERENCE nets
into the Flax re-implementations and require matching outputs."""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marl_dmfb_tpu.models.networks import (
    CRNNAgent, RNNAgent, QMixer, TorchGRUCell, vdn_mix, conv_out_size,
)

sys.path.append("/root/reference")  # append: repo-root modules (evaluate.py) must win
torch = pytest.importorskip("torch")  # CI images ship no torch; this
# module is the torch-weight transplant parity suite, so it self-skips there

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestGRUCell:
    def test_matches_torch(self):
        H, D, B = 16, 12, 5
        ref = torch.nn.GRUCell(D, H)
        cell = TorchGRUCell(hidden=H)
        params = cell.init(jax.random.PRNGKey(0), jnp.zeros((B, D)), jnp.zeros((B, H)))
        params = {
            "params": {
                "wi": t2j(ref.weight_ih).T,
                "wh": t2j(ref.weight_hh).T,
                "bi": t2j(ref.bias_ih),
                "bh": t2j(ref.bias_hh),
            }
        }
        x = np.random.RandomState(1).randn(B, D).astype(np.float32)
        h = np.random.RandomState(2).randn(B, H).astype(np.float32)
        out_ref = ref(torch.tensor(x), torch.tensor(h)).detach().numpy()
        out = np.array(cell.apply(params, jnp.asarray(x), jnp.asarray(h)))
        np.testing.assert_allclose(out, out_ref, atol=1e-5)


def _ref_args(fov=9, n_actions=5, hyper=24, obs_channels=3):
    obs_dim = obs_channels * fov * fov + 2
    return argparse.Namespace(
        obs_shape=(obs_channels, fov, fov, 2, obs_dim),
        hyper_hidden_dim=hyper,
        rnn_hidden_dim=128,
        n_actions=n_actions,
        fov=fov,
        net="crnn",
        last_action=True,
        reuse_network=True,
        qmix_hidden_dim=32,
        two_hyper_layers=True,
        state_shape=300,
        n_agents=4,
    )


def transplant_crnn(ref_net, fov):
    """torch CRNN state -> flax params dict."""
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    params = {}
    n_convs = {5: 1, 7: 2, 9: 2, 11: 2, 13: 2, 19: 3}[fov]
    for i in range(1, n_convs + 1):
        params[f"conv{i}"] = {
            "w": jnp.asarray(sd[f"conv{i}.weight"]).transpose(2, 3, 1, 0),
            "b": jnp.asarray(sd[f"conv{i}.bias"]),
        }
    params["mlp1"] = {
        "w": jnp.asarray(sd["mlp1.weight"]).T,
        "b": jnp.asarray(sd["mlp1.bias"]),
    }
    params["gru"] = {
        "wi": jnp.asarray(sd["rnn.weight_ih"]).T,
        "wh": jnp.asarray(sd["rnn.weight_hh"]).T,
        "bi": jnp.asarray(sd["rnn.bias_ih"]),
        "bh": jnp.asarray(sd["rnn.bias_hh"]),
    }
    params["fc1"] = {
        "w": jnp.asarray(sd["fc1.weight"]).T,
        "b": jnp.asarray(sd["fc1.bias"]),
    }
    return params


class TestCRNN:
    @pytest.mark.parametrize("fov,hyper", [(5, 32), (9, 24), (19, 32)])
    def test_matches_reference_crnn(self, fov, hyper):
        from network.base_net import CRNN as RefCRNN  # reference module

        args = _ref_args(fov=fov, hyper=hyper)
        ref = RefCRNN(args)
        net = CRNNAgent(
            n_actions=args.n_actions,
            obs_channels=3,
            fov=fov,
            conv_channels=hyper,
            rnn_hidden=128,
        )
        params = {"params": transplant_crnn(ref, fov)}
        B = 8
        D = args.obs_shape[-1] + args.n_actions
        rs = np.random.RandomState(3)
        x = rs.randn(B, D).astype(np.float32)
        h = rs.randn(B, 128).astype(np.float32)
        q_ref, h_ref = ref(torch.tensor(x), torch.tensor(h))
        q, h2 = net.apply(params, jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(np.array(q), q_ref.detach().numpy(), atol=1e-4)
        np.testing.assert_allclose(np.array(h2), h_ref.detach().numpy(), atol=1e-4)


class TestRNN:
    def test_matches_reference_rnn(self):
        from network.base_net import RNN as RefRNN

        args = _ref_args()
        input_shape = 50
        ref = RefRNN(input_shape, args)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        net = RNNAgent(n_actions=args.n_actions, rnn_hidden=128)
        params = {
            "params": {
                "fc1": {"w": jnp.asarray(sd["fc1.weight"]).T,
                        "b": jnp.asarray(sd["fc1.bias"])},
                "gru": {"wi": jnp.asarray(sd["rnn.weight_ih"]).T,
                        "wh": jnp.asarray(sd["rnn.weight_hh"]).T,
                        "bi": jnp.asarray(sd["rnn.bias_ih"]),
                        "bh": jnp.asarray(sd["rnn.bias_hh"])},
                "fc2": {"w": jnp.asarray(sd["fc2.weight"]).T,
                        "b": jnp.asarray(sd["fc2.bias"])},
            }
        }
        rs = np.random.RandomState(4)
        x = rs.randn(6, input_shape).astype(np.float32)
        h = rs.randn(6, 128).astype(np.float32)
        q_ref, h_ref = ref(torch.tensor(x), torch.tensor(h))
        q, h2 = net.apply(params, jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(np.array(q), q_ref.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.array(h2), h_ref.detach().numpy(), atol=1e-5)


class TestMixers:
    def test_vdn_mix(self):
        q = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
        out = vdn_mix(q)
        assert out.shape == (2, 3, 1)
        np.testing.assert_allclose(np.array(out[0, 0, 0]), 0 + 1 + 2 + 3)

    def test_qmix_matches_reference(self):
        from network.qmix_net import QMixNet as RefQMix

        args = _ref_args()
        ref = RefQMix(args)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        def lin(prefix):
            return {"w": jnp.asarray(sd[f"{prefix}.weight"]).T,
                    "b": jnp.asarray(sd[f"{prefix}.bias"])}

        params = {
            "params": {
                "hyper_w1_1": lin("hyper_w1.0"),
                "hyper_w1_2": lin("hyper_w1.2"),
                "hyper_w2_1": lin("hyper_w2.0"),
                "hyper_w2_2": lin("hyper_w2.2"),
                "hyper_b1": lin("hyper_b1"),
                "hyper_b2_1": lin("hyper_b2.0"),
                "hyper_b2_2": lin("hyper_b2.2"),
            }
        }
        mixer = QMixer(n_agents=args.n_agents, state_dim=args.state_shape,
                       qmix_hidden=32, hyper_hidden=args.hyper_hidden_dim,
                       two_hyper_layers=True)
        rs = np.random.RandomState(5)
        b, T = 3, 7
        q = rs.randn(b, T, args.n_agents).astype(np.float32)
        s = rs.randn(b, T, args.state_shape).astype(np.float32)
        out_ref = ref(torch.tensor(q), torch.tensor(s)).detach().numpy()
        out = np.array(mixer.apply(params, jnp.asarray(q), jnp.asarray(s)))
        np.testing.assert_allclose(out, out_ref.reshape(out.shape), atol=1e-4)


class TestShapes:
    def test_conv_out_sizes(self):
        assert conv_out_size(5) == 3
        assert conv_out_size(9) == 5
        assert conv_out_size(19) == 5
