"""Gaussian model state: static-capacity pytrees + pure state transitions.

TPU-first re-design of `GaussianModel` (/root/reference/scene/gaussian_model.py:32-771).
The reference is a stateful nn.Module whose tensors are reallocated on every
densify/prune; under XLA shapes must be static, so here the model is a
flax.struct dataclass with CAPACITY-padded arrays and an `alive` mask
(SURVEY.md §5.8, §7.1): densify/clone/split/prune become masked writes
(train/densify.py), never reallocations.

Conventions identical to the reference:
  scaling stored as log (exp activation), opacity as logit (sigmoid),
  rotation unnormalized wxyz (normalized at use), SH split into dc/rest,
  keypoints ("super gaussians") in a second padded buffer.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gaussianprediction_tpu.config import Config
from gaussianprediction_tpu.ops import hashgrid
from gaussianprediction_tpu.ops.knn import mean_knn_sq_dist
from gaussianprediction_tpu.utils.math import inverse_sigmoid
from gaussianprediction_tpu.utils.sh import rgb_to_sh


@flax.struct.dataclass
class GaussianState:
    """All trainable params + alive masks + densification statistics."""

    params: Dict[str, Any]
    alive: jnp.ndarray           # [C] bool
    kpt_alive: jnp.ndarray       # [Ck] bool
    # densification statistics (train.py:163-192, gaussian_model.py:756-772)
    xyz_gradient_accum: jnp.ndarray      # [C]
    xyz_gradient_accum_max: jnp.ndarray  # [C]
    denom: jnp.ndarray                   # [C]
    max_radii2D: jnp.ndarray             # [C] int32
    xyz_motion_accum_max: jnp.ndarray    # [C] (teacher-guided kpt growth)
    motion_denom: jnp.ndarray            # [C]

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]

    @property
    def kpt_capacity(self) -> int:
        return self.params["super_xyz"].shape[0]

    def n_alive(self):
        return jnp.sum(self.alive)

    def n_kpts(self):
        return jnp.sum(self.kpt_alive)


def scaling_act(s):
    return jnp.exp(s)


def opacity_act(o):
    return jax.nn.sigmoid(o)


def rotation_act(q):
    return q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
    )


def get_shs(params):
    """[C, 3, B] SH coefficients from the dc/rest split (reference
    get_features, gaussian_model.py:154-158, transposed for eval_sh)."""
    feats = jnp.concatenate(
        [params["features_dc"], params["features_rest"]], axis=1
    )  # [C, B, 3]
    return jnp.swapaxes(feats, 1, 2)


def deform_input_dims(cfg: Config):
    time_dim = 2 * cfg.opt.time_freq
    xyz_dim = 6 * cfg.opt.xyz_freq
    return time_dim, xyz_dim


def create_from_pcd(
    key,
    cfg: Config,
    points: np.ndarray,
    colors: np.ndarray,
) -> GaussianState:
    """Initialize the model from a point cloud (create_from_pcd twin,
    /root/reference/scene/gaussian_model.py:327-392), padded to capacity."""
    C = cfg.model.padded_capacity()
    Ck = cfg.model.kpt_capacity()
    N0 = min(len(points), C)
    F = cfg.model.feature_dim
    B = (cfg.model.sh_degree + 1) ** 2

    pts = jnp.zeros((C, 3), jnp.float32).at[:N0].set(
        jnp.asarray(points[:N0], jnp.float32)
    )
    alive = jnp.zeros((C,), bool).at[:N0].set(True)

    # initial scales: log(sqrt(mean sq dist of 3 NN)) (gaussian_model.py:341-342)
    dist2 = jnp.clip(
        mean_knn_sq_dist(pts, k=3, valid=alive), 1e-7, None
    )
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    scales = jnp.where(alive[:, None], scales, -10.0)

    fused_color = rgb_to_sh(jnp.asarray(colors[:N0], jnp.float32))
    features_dc = jnp.zeros((C, 1, 3), jnp.float32).at[:N0, 0].set(fused_color)

    rots = jnp.zeros((C, 4), jnp.float32).at[:, 0].set(1.0)
    opac = jnp.full((C, 1), inverse_sigmoid(jnp.float32(0.1)), jnp.float32)
    opac = jnp.where(alive[:, None], opac, -15.0)  # dead slots: ~0 opacity

    key, k_mf, k_df, k_hash, k_wmlp = jax.random.split(key, 5)
    motion_feature = 1e-3 * (
        2.0 * jax.random.uniform(k_mf, (C, F), jnp.float32) - 1.0
    )

    time_dim, xyz_dim = deform_input_dims(cfg)
    delta_dim = 8 if cfg.model.step_opacity else 7
    mlp_sizes = (
        [time_dim + xyz_dim + F]
        + [cfg.model.w] * cfg.model.d
        + [delta_dim]
    )
    df_mlp = hashgrid.init_mlp(k_df, mlp_sizes)

    m = cfg.model
    if m.weight_encoder == "fourier":
        from gaussianprediction_tpu.ops import fourier_enc

        tables = None
        n_feat = fourier_enc.fourier_feature_dim(
            m.hash_levels, m.fourier_per_level
        )
    elif m.weight_encoder == "brick":
        tables = hashgrid.init_brickgrid(
            k_hash, n_levels=m.hash_levels, n_features=m.hash_features,
            log2_Tb=m.hash_log2_Tb, n_min=m.hash_min_res,
            max_res=m.hash_max_res,
        )
        n_feat = m.hash_levels * m.hash_features
    else:
        tables = hashgrid.init_hashgrid(
            k_hash, n_levels=m.hash_levels, n_features=m.hash_features,
            log2_T=m.hash_log2_T, n_min=m.hash_min_res,
            max_res=m.hash_max_res,
        )
        n_feat = sum(t.shape[1] for t in tables.values())
    weight_mlp = hashgrid.init_mlp(
        k_wmlp,
        [n_feat]
        + [m.weight_mlp_width] * m.weight_mlp_depth
        + [2 * cfg.model.nearest_num],
    )

    params = {
        "xyz": pts,
        "features_dc": features_dc,
        "features_rest": jnp.zeros((C, B - 1, 3), jnp.float32),
        "scaling": scales,
        "rotation": rots,
        "opacity": opac,
        "motion_feature": motion_feature,
        "opacity_thres": jnp.full((C, 1), -2.0, jnp.float32),
        "super_xyz": jnp.ones((Ck, 3), jnp.float32),
        "super_feature": jnp.ones((Ck, F), jnp.float32),
        "df_mlp": df_mlp,
        "weight_mlp": weight_mlp,
    }
    if tables is not None:
        params["hash_tables"] = tables
    kpt_alive = jnp.zeros((Ck,), bool)
    # NOTE: each stat gets its own zeros array — sharing one buffer breaks
    # buffer donation in the jitted train step (same buffer donated twice).
    return GaussianState(
        params=params,
        alive=alive,
        kpt_alive=kpt_alive,
        xyz_gradient_accum=jnp.zeros((C,), jnp.float32),
        xyz_gradient_accum_max=jnp.zeros((C,), jnp.float32),
        denom=jnp.zeros((C,), jnp.float32),
        max_radii2D=jnp.zeros((C,), jnp.int32),
        xyz_motion_accum_max=jnp.zeros((C,), jnp.float32),
        motion_denom=jnp.zeros((C,), jnp.float32),
    )


PLY_SH_ORDER = ["x", "y", "z", "nx", "ny", "nz"]


def save_ply(state: GaussianState, path: str, compact: bool = True):
    """Canonical-Gaussian PLY export, attribute layout identical to the
    reference (gaussian_model.py:493-524) so third-party 3DGS viewers work.
    compact=True writes only alive rows."""
    from gaussianprediction_tpu.utils import ply

    p = state.params
    alive = np.asarray(state.alive)
    sel = alive if compact else np.ones_like(alive, bool)
    xyz = np.asarray(p["xyz"])[sel]
    f_dc = np.asarray(p["features_dc"])[sel]      # [n, 1, 3]
    f_rest = np.asarray(p["features_rest"])[sel]  # [n, B-1, 3]
    arrays = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(len(xyz), np.float32),
        "ny": np.zeros(len(xyz), np.float32),
        "nz": np.zeros(len(xyz), np.float32),
    }
    order = list(PLY_SH_ORDER)
    # f_dc flattened channel-major ([n, 3, 1] transpose), like the reference
    fd = np.transpose(f_dc, (0, 2, 1)).reshape(len(xyz), -1)
    for i in range(fd.shape[1]):
        arrays[f"f_dc_{i}"] = fd[:, i]
        order.append(f"f_dc_{i}")
    fr = np.transpose(f_rest, (0, 2, 1)).reshape(len(xyz), -1)
    for i in range(fr.shape[1]):
        arrays[f"f_rest_{i}"] = fr[:, i]
        order.append(f"f_rest_{i}")
    arrays["opacity"] = np.asarray(p["opacity"])[sel][:, 0]
    order.append("opacity")
    sc = np.asarray(p["scaling"])[sel]
    for i in range(3):
        arrays[f"scale_{i}"] = sc[:, i]
        order.append(f"scale_{i}")
    rt = np.asarray(p["rotation"])[sel]
    for i in range(4):
        arrays[f"rot_{i}"] = rt[:, i]
        order.append(f"rot_{i}")
    arrays = {k: v.astype(np.float32) for k, v in arrays.items()}
    ply.write_ply(path, arrays, order=order)


def load_ply_params(path: str, cfg: Config):
    """Read a reference-layout Gaussian PLY into capacity-padded arrays.

    (The reference's own PLY-load path is dead code — scene/__init__.py:89
    calls a nonexistent method, SURVEY.md §5.4 — but we support it so saved
    artifacts round-trip.)
    """
    from gaussianprediction_tpu.utils import ply

    v = ply.read_ply(path)
    n = len(v["x"])
    C = cfg.model.padded_capacity()
    B = (cfg.model.sh_degree + 1) ** 2

    def padded(a, shape):
        out = np.zeros((C,) + shape, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    xyz = np.stack([v["x"], v["y"], v["z"]], 1)
    n_dc = len([k for k in v if k.startswith("f_dc_")])
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(n_dc)], 1)
    f_dc = f_dc.reshape(n, 3, 1).transpose(0, 2, 1)
    n_rest = len([k for k in v if k.startswith("f_rest_")])
    f_rest = np.stack([v[f"f_rest_{i}"] for i in range(n_rest)], 1)
    f_rest = f_rest.reshape(n, 3, B - 1).transpose(0, 2, 1)
    out = {
        "xyz": padded(xyz, (3,)),
        "features_dc": padded(f_dc, (1, 3)),
        "features_rest": padded(f_rest, (B - 1, 3)),
        "opacity": padded(v["opacity"][:, None], (1,)) + jnp.where(
            jnp.arange(C)[:, None] < n, 0.0, -15.0
        ),
        "scaling": padded(np.stack([v[f"scale_{i}"] for i in range(3)], 1),
                          (3,)),
        "rotation": padded(np.stack([v[f"rot_{i}"] for i in range(4)], 1),
                           (4,)),
    }
    alive = jnp.arange(C) < n
    return out, alive
