"""GCN training + autoregressive motion-extrapolation rollout.

Twin of train_gcn/operate/predict_more (/root/reference/train_GCN.py:19-180):
Adam(lr=0.01, eps=1e-15) with cosine annealing to 1e-4 over the epochs,
shuffled drop-last minibatches, annealed uniform input noise
(noise_init * max(1 - epoch/noise_step, 0), halved for rotations), loss =
mean ||Δxyz||_2 + mean ||Δq||_2 over keypoints, then an autoregressive
rollout feeding predictions back into the input window.

The GCN consumes windows laid out [B, C, nodes, frames] (the reference's
permute(0, 3, 2, 1) at train_GCN.py:36).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.models import gcn as GCN
from gaussianprediction_tpu.motion.dataset import Windows


@dataclasses.dataclass
class GCNConfig:
    """gcn_training flags (options/gaussian_option.py:21-38 + per-scene
    predict scripts: num_stage 6 for D-NeRF, 16 for HyperNeRF)."""

    input_size: int = 10
    output_size: int = 1
    linear_size: int = 128
    num_stage: int = 4
    epochs: int = 101
    batch_size: int = 32
    lr: float = 0.01
    lr_min: float = 1e-4
    noise_init: float = 0.1
    noise_step: int = 100
    norm_rotation: bool = False
    no_mapping: bool = False
    dropout: float = 0.0


def _to_model_layout(x):
    """[B, frames, K, C] -> [B, C, K, frames]."""
    return jnp.transpose(x, (0, 3, 2, 1))


def _from_model_layout(x):
    return jnp.transpose(x, (0, 3, 2, 1))


def gcn_forward(params, bn_state, xyz_in, rot_in, cfg: GCNConfig,
                train: bool, key=None):
    """operate() twin: window [B, frames, K, C] -> prediction
    [B, output, K, C]."""
    xo, ro, bn2 = GCN.gcn_xyzr_apply(
        params, bn_state, _to_model_layout(xyz_in), _to_model_layout(rot_in),
        train, cfg.dropout, key,
    )
    xo = _from_model_layout(xo)
    ro = _from_model_layout(ro)
    if cfg.norm_rotation:
        ro = ro / jnp.maximum(
            jnp.linalg.norm(ro, axis=-1, keepdims=True), 1e-12
        )
    return xo, ro, bn2


def train_gcn(
    windows: Windows, n_kpts: int, cfg: GCNConfig, seed: int = 0,
    verbose: bool = True,
):
    """Returns (params, bn_state, loss_history)."""
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params, bn_state = GCN.init_gcn_xyzr(
        k_init, cfg.input_size, cfg.linear_size, cfg.output_size,
        cfg.num_stage, n_kpts, cfg.no_mapping,
    )
    opt_state = {
        "m": jax.tree.map(jnp.zeros_like, params),
        "v": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.int32(0),
    }

    def loss_fn(params, bn_state, xi, ri, xg, rg, dkey):
        xo, ro, bn2 = gcn_forward(params, bn_state, xi, ri, cfg,
                                  train=True, key=dkey)
        loss = jnp.mean(jnp.linalg.norm(xo - xg, axis=-1)) + jnp.mean(
            jnp.linalg.norm(ro - rg, axis=-1)
        )
        return loss, bn2

    @jax.jit
    def step(params, bn_state, opt_state, lr, xi, ri, xg, rg, dkey):
        (loss, bn2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bn_state, xi, ri, xg, rg, dkey
        )
        b1, b2, eps = 0.9, 0.999, 1e-15
        t = opt_state["step"] + 1
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)

        def upd(p, g, m, v):
            if not isinstance(p, jnp.ndarray):
                return p, m, v
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            return p - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps), m2, v2

        flat_p, tree = jax.tree.flatten(params)
        flat_g = jax.tree.leaves(grads)
        flat_m = jax.tree.leaves(opt_state["m"])
        flat_v = jax.tree.leaves(opt_state["v"])
        out = [upd(p, g, m, v)
               for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
        params2 = jax.tree.unflatten(tree, [o[0] for o in out])
        m2 = jax.tree.unflatten(tree, [o[1] for o in out])
        v2 = jax.tree.unflatten(tree, [o[2] for o in out])
        return params2, bn2, {"m": m2, "v": v2, "step": t}, loss

    n = len(windows.xyz_inputs)
    bs = min(cfg.batch_size, max(n, 1))
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(cfg.epochs):
        lr = cfg.lr_min + 0.5 * (cfg.lr - cfg.lr_min) * (
            1 + np.cos(np.pi * epoch / cfg.epochs)
        )
        noise_xyz = cfg.noise_init * max(1.0 - epoch / cfg.noise_step, 0.0)
        noise_r = noise_xyz * 0.5
        perm = rng.permutation(n)
        losses = []
        for b in range(n // bs):
            sel = perm[b * bs:(b + 1) * bs]
            xi = windows.xyz_inputs[sel]
            ri = windows.rot_inputs[sel]
            if noise_xyz > 0:
                xi = xi + (2 * rng.random(xi.shape) - 1) * noise_xyz
                ri_n = ri + (2 * rng.random(ri.shape) - 1) * noise_r
                if cfg.norm_rotation:
                    ri_n = ri_n / np.maximum(
                        np.linalg.norm(ri_n, axis=-1, keepdims=True), 1e-12
                    )
                ri = ri_n
            key, dkey = jax.random.split(key)
            params, bn_state, opt_state, loss = step(
                params, bn_state, opt_state, jnp.float32(lr),
                jnp.asarray(xi, jnp.float32), jnp.asarray(ri, jnp.float32),
                jnp.asarray(windows.xyz_gt[sel]),
                jnp.asarray(windows.rot_gt[sel]), dkey,
            )
            losses.append(float(loss))
        if losses:
            history.append(float(np.mean(losses)))
            if verbose and epoch % max(cfg.epochs // 10, 1) == 0:
                print(f"[gcn epoch {epoch}] loss {history[-1]:.5f} lr {lr:.4f}")
    return params, bn_state, history


def save_gcn_checkpoint(path: str, params, bn_state, cfg: GCNConfig,
                        n_kpts: int, loss_history):
    """Persist the trained predictor (params + BN state + config), twin of
    the reference's torch.save(model.state_dict(), ckpt.pth)
    (/root/reference/train_GCN.py:113-114). The config + n_kpts ride along
    so `load_gcn_checkpoint` can rebuild the pytree template without the
    caller re-deriving hyperparameters."""
    import json

    from gaussianprediction_tpu.train.checkpoint import _flatten

    flat = _flatten({"params": params, "bn": bn_state})
    flat = {k: np.asarray(v) for k, v in flat.items()}
    flat["__gcn_meta__"] = np.array(json.dumps(
        {**dataclasses.asdict(cfg), "n_kpts": int(n_kpts)}
    ))
    flat["__loss_history__"] = np.asarray(loss_history, np.float32)
    np.savez(path, **flat)


def load_gcn_checkpoint(path: str):
    """Returns (params, bn_state, cfg, n_kpts, loss_history). The reload
    twin of /root/reference/train_GCN.py:83 (`model.load_state_dict`):
    rollout from a reloaded checkpoint is bit-identical to the in-process
    rollout (tests/test_motion.py)."""
    import json

    from gaussianprediction_tpu.models import gcn as GCN_
    from gaussianprediction_tpu.train.checkpoint import _unflatten

    with np.load(path, allow_pickle=False) as f:
        flat = {k: f[k] for k in f.files}
    meta = json.loads(str(flat.pop("__gcn_meta__")))
    hist = [float(x) for x in flat.pop("__loss_history__")]
    n_kpts = meta.pop("n_kpts")
    cfg = GCNConfig(**meta)
    t_params, t_bn = GCN_.init_gcn_xyzr(
        jax.random.PRNGKey(0), cfg.input_size, cfg.linear_size,
        cfg.output_size, cfg.num_stage, n_kpts, cfg.no_mapping,
    )
    params = _unflatten(
        {k[len("params/"):]: v for k, v in flat.items()
         if k.startswith("params/")}, t_params,
    )
    bn_state = _unflatten(
        {k[len("bn/"):]: v for k, v in flat.items() if k.startswith("bn/")},
        t_bn,
    )
    params = jax.tree.map(jnp.asarray, params)
    bn_state = jax.tree.map(jnp.asarray, bn_state)
    return params, bn_state, cfg, n_kpts, hist


def rollout(
    params, bn_state, cfg: GCNConfig, xyz_window, rot_window, frames: int,
):
    """predict_more twin (train_GCN.py:124-148): autoregressive rollout.

    xyz_window [input, K, 3], rot_window [input, K, 4] seed the window;
    returns (kpts [frames, K, 3], kpts_rotation [frames, K, 4])."""

    @jax.jit
    def one(xi, ri):
        xo, ro, _ = gcn_forward(
            params, bn_state, xi[None], ri[None], cfg, train=False
        )
        return xo[0], ro[0]

    xi = jnp.asarray(xyz_window, jnp.float32)
    ri = jnp.asarray(rot_window, jnp.float32)
    out_x, out_r = [], []
    for _ in range(frames):
        xo, ro = one(xi, ri)
        out_x.append(np.asarray(xo[-cfg.output_size:]))
        out_r.append(np.asarray(ro[-cfg.output_size:]))
        xi = jnp.concatenate([xi[cfg.output_size:], xo[-cfg.output_size:]], 0)
        ri = jnp.concatenate([ri[cfg.output_size:], ro[-cfg.output_size:]], 0)
    return np.concatenate(out_x, 0)[:frames], np.concatenate(out_r, 0)[:frames]
