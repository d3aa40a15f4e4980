"""Checkpoint save/restore: full training state with shape metadata.

Twin of the reference's torch.save((state_dict, opt_state, iteration))
checkpoints (/root/reference/train.py:199-201, restore at :48-57 +
gaussian_model.py:96-104), TPU-style (SURVEY.md §5.4): the whole
params/opt-state pytree + alive masks + densification stats + iteration +
RNG key in one npz, with path-flattened keys. Capacity padding makes shapes
static, so restore never needs the reference's shape-rederivation dance.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray], template):
    if isinstance(template, dict):
        return {
            k: _unflatten(
                {p[len(k) + 1:]: v for p, v in flat.items()
                 if p.split("/")[0] == k},
                template[k],
            )
            for k in template
        }
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten(
                {p[len(str(i)) + 1:]: v for p, v in flat.items()
                 if p.split("/")[0] == str(i)},
                template[i],
            )
            for i in range(len(template))
        ]
        return type(template)(seq)
    (val,) = flat.values()
    return val


def save_checkpoint(path: str, state, opt_state, iteration: int, rng_key,
                    extra: Dict[str, Any] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "params": state.params,
        "opt": opt_state,
        "meta": {
            "alive": state.alive,
            "kpt_alive": state.kpt_alive,
            "xyz_gradient_accum": state.xyz_gradient_accum,
            "xyz_gradient_accum_max": state.xyz_gradient_accum_max,
            "denom": state.denom,
            "max_radii2D": state.max_radii2D,
            "xyz_motion_accum_max": state.xyz_motion_accum_max,
            "motion_denom": state.motion_denom,
            "iteration": np.int64(iteration),
            "rng_key": jax.random.key_data(rng_key),
        },
    }
    if extra:
        blob["extra"] = extra
    np.savez(path, **_flatten(blob))


def load_checkpoint(path: str, state_template, opt_template) -> Tuple:
    """Returns (state, opt_state, iteration, rng_key). Templates provide the
    pytree structure (build them with the same config)."""
    from gaussianprediction_tpu.models.gaussians import GaussianState

    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    params_flat = {k[7:]: v for k, v in flat.items() if k.startswith("params/")}
    opt_flat = {k[4:]: v for k, v in flat.items() if k.startswith("opt/")}
    import jax.numpy as jnp

    params = _unflatten(params_flat, state_template.params)
    opt_state = _unflatten(opt_flat, opt_template)
    opt_state = jax.tree.map(jnp.asarray, opt_state)
    meta = {k[5:]: v for k, v in flat.items() if k.startswith("meta/")}
    # device arrays, not numpy: loaded params are indexed by tracers inside
    # jitted steps (np_array[tracer] raises TracerArrayConversionError)
    state = GaussianState(
        params=jax.tree.map(jnp.asarray, params),
        alive=jnp.asarray(meta["alive"]),
        kpt_alive=jnp.asarray(meta["kpt_alive"]),
        xyz_gradient_accum=jnp.asarray(meta["xyz_gradient_accum"]),
        xyz_gradient_accum_max=jnp.asarray(meta["xyz_gradient_accum_max"]),
        denom=jnp.asarray(meta["denom"]),
        max_radii2D=jnp.asarray(meta["max_radii2D"]),
        xyz_motion_accum_max=jnp.asarray(meta["xyz_motion_accum_max"]),
        motion_denom=jnp.asarray(meta["motion_denom"]),
    )
    rng_key = jax.random.wrap_key_data(meta["rng_key"])
    return state, opt_state, int(meta["iteration"]), rng_key
