"""Cross-framework parity: our jnp modules vs torch re-implementations of
the reference's exact formulas (weights copied both ways). Strongest
evidence available offline that the math matches the reference
(/root/reference) — the formulas below are re-typed from its sources, not
imported."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from gaussianprediction_tpu.models import gcn as GCN
from gaussianprediction_tpu.ops import hashgrid
from gaussianprediction_tpu.utils import math as gmath


class TestPositionalEncodingParity:
    def test_matches_torch_formula(self):
        """deformable_field.py:63-72 formula re-typed in torch."""

        def torch_pe(positions, freqs):
            freq_bands = (2 ** torch.arange(freqs).float())
            pts = (positions[..., None] * freq_bands).reshape(
                positions.shape[:-1] + (freqs * positions.shape[-1],)
            )
            return torch.stack(
                [torch.sin(pts), torch.cos(pts)], dim=-1
            ).reshape(pts.shape[:-1] + (pts.shape[-1] * 2,))

        x = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
        ours = np.asarray(gmath.positional_encoding(jnp.asarray(x), 10))
        theirs = torch_pe(torch.from_numpy(x), 10).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestDeformMLPParity:
    def test_matches_torch_linear_stack(self):
        """Deformable_Field (deformable_field.py:74-127): d x [Linear,ReLU]
        + output Linear, weights copied into torch."""
        key = jax.random.PRNGKey(0)
        sizes = [104, 64, 64, 7]
        params = hashgrid.init_mlp(key, sizes)
        layers = []
        for i, p in enumerate(params):
            lin = torch.nn.Linear(sizes[i], sizes[i + 1])
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
                lin.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
            layers.append(lin)
            if i < len(params) - 1:
                layers.append(torch.nn.ReLU())
        tmod = torch.nn.Sequential(*layers)
        x = np.random.default_rng(1).normal(size=(32, 104)).astype(np.float32)
        ours = np.asarray(hashgrid.mlp_apply(params, jnp.asarray(x)))
        theirs = tmod(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


def _copy_gc(tgc, p):
    with torch.no_grad():
        tgc.weight.copy_(torch.from_numpy(np.asarray(p["weight"])))
        tgc.att.copy_(torch.from_numpy(np.asarray(p["att"])))
        tgc.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


class TorchGraphConvolution(torch.nn.Module):
    """gcn.py:108-138 re-typed."""

    def __init__(self, in_f, out_f, node_n):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.zeros(in_f, out_f))
        self.att = torch.nn.Parameter(torch.zeros(node_n, node_n))
        self.bias = torch.nn.Parameter(torch.zeros(out_f))

    def forward(self, x):
        support = torch.matmul(x, self.weight)
        return torch.matmul(self.att, support) + self.bias


class TestGCNParity:
    def test_full_gcn_forward_matches_torch(self):
        """GCN (gcn.py:185-235): gc1+BN+tanh, GC_Blocks, out MLP — re-typed
        in torch with BatchNorm in eval mode, weights copied from ours."""
        node_n, in_f, hid, out_f, stages = 6, 5, 8, 2, 2
        params, bn_state = GCN.init_gcn(
            jax.random.PRNGKey(3), in_f, hid, out_f, stages, node_n
        )
        # randomize running stats so eval-mode BN is non-trivial
        rng = np.random.default_rng(4)
        for k in bn_state:
            bn_state[k] = {
                "mean": jnp.asarray(rng.normal(size=node_n * hid)
                                    .astype(np.float32) * 0.1),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, node_n * hid)
                                   .astype(np.float32)),
            }

        def make_bn(pp, ss):
            m = torch.nn.BatchNorm1d(node_n * hid)
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(np.asarray(pp["scale"])))
                m.bias.copy_(torch.from_numpy(np.asarray(pp["bias"])))
                m.running_mean.copy_(torch.from_numpy(np.asarray(ss["mean"])))
                m.running_var.copy_(torch.from_numpy(np.asarray(ss["var"])))
            m.eval()
            return m

        gc1 = TorchGraphConvolution(in_f, hid, node_n)
        _copy_gc(gc1, params["gc1"])
        bn1 = make_bn(params["bn1"], bn_state["bn1"])
        blocks = []
        for i, blk in enumerate(params["blocks"]):
            g1 = TorchGraphConvolution(hid, hid, node_n)
            g2 = TorchGraphConvolution(hid, hid, node_n)
            _copy_gc(g1, blk["gc1"])
            _copy_gc(g2, blk["gc2"])
            b1 = make_bn(blk["bn1"], bn_state[f"block{i}_bn1"])
            b2 = make_bn(blk["bn2"], bn_state[f"block{i}_bn2"])
            blocks.append((g1, b1, g2, b2))
        m = params["out_mlp"]
        l1 = torch.nn.Linear(hid, hid)
        l2 = torch.nn.Linear(hid, out_f)
        with torch.no_grad():
            l1.weight.copy_(torch.from_numpy(np.asarray(m[0]["w"]).T))
            l1.bias.copy_(torch.from_numpy(np.asarray(m[0]["b"])))
            l2.weight.copy_(torch.from_numpy(np.asarray(m[1]["w"]).T))
            l2.bias.copy_(torch.from_numpy(np.asarray(m[1]["b"])))

        def torch_forward(x):
            B, n, f = x.shape
            y = gc1(x)
            y = bn1(y.view(B, -1)).view(B, n, hid)
            y = torch.tanh(y)
            for g1, b1, g2, b2 in blocks:
                z = g1(y)
                z = torch.tanh(b1(z.view(B, -1)).view(B, n, hid))
                z = g2(z)
                z = torch.tanh(b2(z.view(B, -1)).view(B, n, hid))
                y = y + z
            return l2(torch.relu(l1(y)))

        x = rng.normal(size=(3, node_n, in_f)).astype(np.float32)
        ours, _ = GCN.gcn_apply(params, bn_state, jnp.asarray(x),
                                train=False)
        theirs = torch_forward(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


class TestQuatParityWithTorchFormulas:
    def test_quat_mul_matches_reference_formula(self):
        """camera_utils.py:158-170 re-typed in torch."""

        def torch_quat_mul(q1, q2):
            out = torch.zeros_like(q1)
            out[..., 0] = (q2[..., 0] * q1[..., 0] - q2[..., 1] * q1[..., 1]
                           - q2[..., 2] * q1[..., 2] - q2[..., 3] * q1[..., 3])
            out[..., 1] = (q2[..., 1] * q1[..., 0] + q2[..., 0] * q1[..., 1]
                           + q2[..., 3] * q1[..., 2] - q2[..., 2] * q1[..., 3])
            out[..., 2] = (q2[..., 2] * q1[..., 0] - q2[..., 3] * q1[..., 1]
                           + q2[..., 0] * q1[..., 2] + q2[..., 1] * q1[..., 3])
            out[..., 3] = (q2[..., 3] * q1[..., 0] + q2[..., 2] * q1[..., 1]
                           - q2[..., 1] * q1[..., 2] + q2[..., 0] * q1[..., 3])
            return out

        rng = np.random.default_rng(5)
        q1 = rng.normal(size=(9, 4)).astype(np.float32)
        q2 = rng.normal(size=(9, 4)).astype(np.float32)
        ours = np.asarray(gmath.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        theirs = torch_quat_mul(torch.from_numpy(q1),
                                torch.from_numpy(q2)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)
