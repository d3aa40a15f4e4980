"""Graph-convolutional motion-extrapolation network (GCN_xyzr twin).

Re-derivation of /root/reference/motion_model/gcn.py:108-275 in functional
JAX: `GraphConvolution` is a learned-adjacency graph conv
`att @ (x @ W) + b` over keypoint-channel nodes; `GC_Block` stacks two of
them with BatchNorm1d + tanh and a residual; `GCN` = in-proj + num_stage
blocks + a 2-layer MLP head; `GCN_xyzr` runs one GCN over the
3*(n_kpts) xyz nodes and one over the 4*(n_kpts) rotation nodes (rotation
output L2-normalized over the channel axis, gcn.py:273).

BatchNorm follows torch semantics (batch stats in training with running-
stat EMA momentum 0.1, running stats in eval), so state = (params,
bn_state). All matmuls are MXU-shaped ([B, nodes, F] x [F, F] and
[nodes, nodes] adjacency contractions).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def _uniform(key, shape, stdv):
    return jax.random.uniform(key, shape, jnp.float32, -stdv, stdv)


def init_graph_conv(key, in_f: int, out_f: int, node_n: int):
    """reset_parameters twin (gcn.py:125-130): U(±1/sqrt(out_features))."""
    stdv = 1.0 / math.sqrt(out_f)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "weight": _uniform(k1, (in_f, out_f), stdv),
        "att": _uniform(k2, (node_n, node_n), stdv),
        "bias": _uniform(k3, (out_f,), stdv),
    }


def graph_conv(p, x):
    """att @ (x @ W) + b; x: [B, nodes, in_f] -> [B, nodes, out_f]."""
    support = jnp.einsum("bnf,fg->bng", x, p["weight"])
    return jnp.einsum("nm,bmg->bng", p["att"], support) + p["bias"]


def init_bn(n: int):
    return (
        {"scale": jnp.ones((n,), jnp.float32),
         "bias": jnp.zeros((n,), jnp.float32)},
        {"mean": jnp.zeros((n,), jnp.float32),
         "var": jnp.ones((n,), jnp.float32)},
    )


def batch_norm(p, s, x, train: bool):
    """BatchNorm1d over flattened [B, nodes*feat] (gcn.py:156,167)."""
    B, n, f = x.shape
    flat = x.reshape(B, n * f)
    if train:
        mean = jnp.mean(flat, axis=0)
        var = jnp.var(flat, axis=0)
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"]
            + BN_MOMENTUM * var * B / max(B - 1, 1),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    out = (flat - mean) / jnp.sqrt(var + BN_EPS) * p["scale"] + p["bias"]
    return out.reshape(B, n, f), new_s


def init_gcn(key, input_f: int, hidden_f: int, output_f: int, num_stage: int,
             node_n: int, no_mapping: bool = False):
    keys = jax.random.split(key, 2 + 4 * num_stage + 2)
    params = {"gc1": init_graph_conv(keys[0], input_f, hidden_f, node_n)}
    bn_p, bn_s = init_bn(node_n * hidden_f)
    params["bn1"] = bn_p
    bn_state = {"bn1": bn_s}
    params["blocks"] = []
    for i in range(num_stage):
        blk = {}
        blk["gc1"] = init_graph_conv(
            keys[1 + 4 * i], hidden_f, hidden_f, node_n
        )
        blk["gc2"] = init_graph_conv(
            keys[2 + 4 * i], hidden_f, hidden_f, node_n
        )
        b1p, b1s = init_bn(node_n * hidden_f)
        b2p, b2s = init_bn(node_n * hidden_f)
        blk["bn1"], blk["bn2"] = b1p, b2p
        bn_state[f"block{i}_bn1"] = b1s
        bn_state[f"block{i}_bn2"] = b2s
        params["blocks"].append(blk)
    if no_mapping:
        params["out_gc"] = init_graph_conv(
            keys[-2], hidden_f, output_f, node_n
        )
    else:
        lim1 = 1.0 / math.sqrt(hidden_f)
        ka, kb, kc, kd = jax.random.split(keys[-1], 4)
        params["out_mlp"] = [
            {"w": _uniform(ka, (hidden_f, hidden_f), lim1),
             "b": _uniform(kb, (hidden_f,), lim1)},
            {"w": _uniform(kc, (hidden_f, output_f), lim1),
             "b": _uniform(kd, (output_f,), lim1)},
        ]
    return params, bn_state


def _dropout(x, p: float, key, train: bool):
    """Inverted dropout (torch nn.Dropout twin); identity when p == 0
    (the reference's default — no key consumed, no graph change)."""
    if not train or p <= 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def gcn_apply(params, bn_state, x, train: bool, p_dropout: float = 0.0,
              key=None):
    """x: [B, nodes, input_f] -> ([B, nodes, output_f], bn_state').

    Dropout placement matches the reference (gcn.py:165-176,221-230):
    after the in-proj tanh and after each GC_Block tanh; none after the
    output head."""
    if p_dropout > 0.0 and train:
        assert key is not None, "dropout > 0 needs an rng key"
    dk = (lambda i: jax.random.fold_in(key, i)) if key is not None else (
        lambda i: None)
    new_bn = {}
    y = graph_conv(params["gc1"], x)
    y, new_bn["bn1"] = batch_norm(
        params["bn1"], bn_state["bn1"], y, train
    )
    y = _dropout(jnp.tanh(y), p_dropout, dk(0), train)
    for i, blk in enumerate(params["blocks"]):
        z = graph_conv(blk["gc1"], y)
        z, new_bn[f"block{i}_bn1"] = batch_norm(
            blk["bn1"], bn_state[f"block{i}_bn1"], z, train
        )
        z = _dropout(jnp.tanh(z), p_dropout, dk(1 + 2 * i), train)
        z = graph_conv(blk["gc2"], z)
        z, new_bn[f"block{i}_bn2"] = batch_norm(
            blk["bn2"], bn_state[f"block{i}_bn2"], z, train
        )
        z = _dropout(jnp.tanh(z), p_dropout, dk(2 + 2 * i), train)
        y = y + z
    if "out_gc" in params:
        y = graph_conv(params["out_gc"], y)
    else:
        m = params["out_mlp"]
        y = jnp.maximum(
            jnp.einsum("bnf,fg->bng", y, m[0]["w"]) + m[0]["b"], 0.0
        )
        y = jnp.einsum("bnf,fg->bng", y, m[1]["w"]) + m[1]["b"]
    return y, new_bn


def init_gcn_xyzr(key, input_f: int, hidden_f: int, output_f: int,
                  num_stage: int, node_n: int, no_mapping: bool = False):
    """GCN_xyzr (gcn.py:260-275): xyz GCN over 3*node_n nodes, rotation GCN
    over 4*node_n nodes."""
    kx, kr = jax.random.split(key)
    px, sx = init_gcn(kx, input_f, hidden_f, output_f, num_stage,
                      node_n * 3, no_mapping)
    pr, sr = init_gcn(kr, input_f, hidden_f, output_f, num_stage,
                      node_n * 4, no_mapping)
    return {"xyz": px, "rot": pr}, {"xyz": sx, "rot": sr}


def gcn_xyzr_apply(params, bn_state, x, r, train: bool,
                   p_dropout: float = 0.0, key=None):
    """x: [B, 3, nodes, F_in], r: [B, 4, nodes, F_in] ->
    (x' [B, 3, nodes, F_out], r' normalized over channel dim, bn_state')."""
    B, C, N, F = x.shape
    kx = kr = None
    if key is not None:
        kx, kr = jax.random.split(key)
    xo, sx = gcn_apply(
        params["xyz"], bn_state["xyz"], x.reshape(B, C * N, F), train,
        p_dropout, kx,
    )
    ro, sr = gcn_apply(
        params["rot"], bn_state["rot"], r.reshape(B, 4 * N, F), train,
        p_dropout, kr,
    )
    xo = xo.reshape(B, C, N, -1)
    ro = ro.reshape(B, 4, N, -1)
    ro = ro / jnp.maximum(
        jnp.linalg.norm(ro, axis=1, keepdims=True), 1e-12
    )
    return xo, ro, {"xyz": sx, "rot": sr}
