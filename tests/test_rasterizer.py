"""Rasterizer correctness: Pallas kernels vs the exact jnp oracle
(SURVEY.md §4b: kernel tests, image- and grad-allclose)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import binning, projection
from gaussianprediction_tpu.ops import rasterize as R
from gaussianprediction_tpu.ops import rasterize_pallas as rp
from gaussianprediction_tpu.ops.rasterize_reference import rasterize_pixels_reference
from gaussianprediction_tpu.utils import sh as shlib

W, H = 64, 48


def scene(n=120, seed=0):
    g = random_gaussians(n, seed=seed, scale_range=(-3.6, -2.2))
    cam = orbit_camera(0.4, width=W, height=H, uid=0)
    return g, cam.to_device_dict()


def _proj(g, cam, alive=None):
    rot = g["rotation"] / np.linalg.norm(g["rotation"], axis=-1, keepdims=True)
    return projection.project_from_params(
        jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
        jnp.asarray(rot), cam, W, H, alive=alive,
    )


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestProjection:
    def test_center_gaussian_projects_to_center(self):
        cam = orbit_camera(0.0, phi=0.0, width=W, height=H).to_device_dict()
        proj = projection.project_gaussians(
            jnp.zeros((1, 3)),
            jnp.asarray([[0.01, 0, 0, 0.01, 0, 0.01]]),
            cam["world_view"], cam["full_proj"],
            cam["tanfovx"], cam["tanfovy"], W, H,
        )
        np.testing.assert_allclose(
            proj.mean2d[0], [(W - 1) / 2, (H - 1) / 2], atol=1e-3
        )
        assert int(proj.radius[0]) > 0
        assert float(proj.depth[0]) == pytest.approx(4.0, abs=1e-4)

    def test_behind_camera_culled(self):
        cam = orbit_camera(0.0, phi=0.0, width=W, height=H).to_device_dict()
        proj = projection.project_gaussians(
            jnp.asarray([[0.0, 0.0, 10.0]]),  # behind (camera at z=4 -> +z)
            jnp.asarray([[0.01, 0, 0, 0.01, 0, 0.01]]),
            cam["world_view"], cam["full_proj"],
            cam["tanfovx"], cam["tanfovy"], W, H,
        )
        assert not bool(proj.visible[0])
        assert int(proj.radius[0]) == 0

    def test_alive_mask_culls(self):
        g, cam = scene(10)
        proj = _proj(g, cam, alive=jnp.zeros(10, bool))
        assert int(jnp.sum(proj.radius)) == 0


class TestTightRects:
    """Exact-support binning (projection.py: opacity-aware rects): identical
    rendered output with strictly fewer tile instances."""

    def _render(self, g, cam, tight, caps=24):
        op = jnp.asarray(_sigmoid(g["opacity_logit"]).reshape(-1),
                         jnp.float32)
        return R.render(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), op, None, cam, W, H,
            jnp.zeros(3), colors_precomp=jnp.asarray(g["colors"]),
            interpret=True, capacity_multiplier=caps, tight_rects=tight,
        )

    def test_ellipse_cull_exact(self, monkeypatch):
        """GPT_ELLIPSE_CULL drops only never-contributing (instance,
        tile) pairs: identical image/depth/gradients to the un-culled
        stream, with shorter tile segments (round 5)."""
        g, cam = scene(n=150, seed=5)

        def run():
            op = jnp.asarray(_sigmoid(g["opacity_logit"]).reshape(-1),
                             jnp.float32)

            def loss(xyz, scal, op_):
                out = R.render(
                    xyz, scal, jnp.asarray(g["rotation"]), op_, None, cam,
                    W, H, jnp.zeros(3),
                    colors_precomp=jnp.asarray(g["colors"]),
                    interpret=True, capacity_multiplier=24,
                )
                return jnp.mean(
                    out["render"] * out["depth"][..., None]
                ), out

            (l, out), gr = jax.value_and_grad(
                loss, argnums=(0, 1, 2), has_aux=True
            )(jnp.asarray(g["xyz"]),
              jnp.exp(jnp.asarray(g["log_scales"])), op)
            return out, gr

        monkeypatch.setenv("GPT_ELLIPSE_CULL", "0")
        out0, gr0 = run()
        monkeypatch.setenv("GPT_ELLIPSE_CULL", "1")
        out1, gr1 = run()
        # ulp-level, not bit-level: removing zero-alpha lanes shifts the
        # chunk partition, so the transmittance scan associates its
        # products differently (om factors are exactly 1.0 for culled
        # lanes — the VALUES are identical, the rounding order is not)
        np.testing.assert_allclose(
            np.asarray(out0["render"]), np.asarray(out1["render"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out0["depth"]), np.asarray(out1["depth"]),
            atol=1e-5,
        )
        for a, b in zip(gr0, gr1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
            )

    def test_same_image_fewer_instances(self):
        g, cam = scene(n=150, seed=3)
        # mix in low-opacity gaussians (post-opacity-reset regime)
        g = dict(g)
        g["opacity_logit"] = g["opacity_logit"].copy()
        g["opacity_logit"][::3] = -4.0   # op ~ 0.018
        g["opacity_logit"][1::7] = -6.5  # op ~ 0.0015 < 1/255
        loose = self._render(g, cam, tight=False)
        tight = self._render(g, cam, tight=True)
        assert int(loose["n_dropped"]) == 0 and int(tight["n_dropped"]) == 0
        np.testing.assert_allclose(
            np.asarray(tight["render"]), np.asarray(loose["render"]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(tight["depth"]), np.asarray(loose["depth"]),
            atol=1e-5,
        )
        assert int(tight["n_instances"]) < int(loose["n_instances"])
        # stats stay reference-faithful: radii/visibility identical
        np.testing.assert_array_equal(
            np.asarray(tight["radii"]), np.asarray(loose["radii"])
        )

    def test_gradients_identical(self):
        g, cam = scene(n=60, seed=4)
        op = jnp.asarray(_sigmoid(g["opacity_logit"]).reshape(-1),
                         jnp.float32)
        args = (jnp.asarray(g["xyz"]),
                jnp.exp(jnp.asarray(g["log_scales"])),
                jnp.asarray(g["rotation"]), op,
                jnp.asarray(g["colors"]))

        def loss(xyz, scal, rot, op, cols, tight):
            out = R.render(xyz, scal, rot, op, None, cam, W, H,
                           jnp.zeros(3), colors_precomp=cols,
                           interpret=True, tight_rects=tight)
            return jnp.mean((out["render"] - 0.3) ** 2)

        g_loose = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, False)
        g_tight = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, True)
        for a, b in zip(g_tight, g_loose):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_opacity_below_1_255_contributes_nothing(self):
        g, cam = scene(n=40, seed=5)
        g = dict(g)
        g["opacity_logit"] = np.full_like(g["opacity_logit"], -7.0)
        out = self._render(g, cam, tight=True)
        # every real instance is culled; n_instances counts only the N
        # per-Gaussian sentinel singletons of the no-depth-sort stream
        assert int(out["n_instances"]) <= 40
        np.testing.assert_allclose(np.asarray(out["render"]), 0.0, atol=0)


class TestBinning:
    def test_instances_cover_rects(self):
        g, cam = scene(60, seed=3)
        proj = _proj(g, cam)
        bins = binning.bin_gaussians(proj, W, H, capacity=8192)
        assert int(bins.n_dropped) == 0
        expected = int(
            jnp.sum(
                jnp.where(
                    proj.visible,
                    (proj.tiles_max[:, 0] - proj.tiles_min[:, 0])
                    * (proj.tiles_max[:, 1] - proj.tiles_min[:, 1]),
                    0,
                )
            )
        )
        assert int(bins.n_instances) == expected
        # every instance's tile is inside its gaussian's rect
        tid = np.asarray(bins.tile_id)
        gid = np.asarray(bins.gauss_id)
        gx = (W + 15) // 16
        valid = tid < gx * ((H + 15) // 16)
        tmin = np.asarray(proj.tiles_min)[gid[valid]]
        tmax = np.asarray(proj.tiles_max)[gid[valid]]
        tx, ty = tid[valid] % gx, tid[valid] // gx
        assert ((tx >= tmin[:, 0]) & (tx < tmax[:, 0])).all()
        assert ((ty >= tmin[:, 1]) & (ty < tmax[:, 1])).all()

    def test_depth_sorted_within_tiles(self):
        g, cam = scene(80, seed=4)
        proj = _proj(g, cam)
        bins = binning.bin_gaussians(proj, W, H, capacity=8192)
        tid = np.asarray(bins.tile_id)
        depth = np.asarray(proj.depth)[np.asarray(bins.gauss_id)]
        for t in np.unique(tid):
            if t >= 12:  # sentinel
                continue
            d = depth[tid == t]
            assert (np.diff(d) >= -1e-6).all()

    def test_aligned_layout(self):
        g, cam = scene(60, seed=5)
        proj = _proj(g, cam)
        bins = binning.bin_gaussians(
            proj, W, H, capacity=8192, align=rp.CHUNK
        )
        assert int(bins.n_dropped) == 0
        starts = np.asarray(bins.tile_start)
        assert (starts % rp.CHUNK == 0).all()
        # padded rows flagged
        gid = np.asarray(bins.gauss_id)
        ends = np.asarray(bins.tile_end)
        for t in range(len(starts)):
            seg = gid[starts[t]:ends[t]]
            assert (seg >= 0).all()


class TestPallasVsOracle:
    def _render_both(self, n=150, seed=1, opacity_boost=0.0):
        g, cam = scene(n, seed=seed)
        opac = _sigmoid(g["opacity_logit"] + opacity_boost).astype(np.float32)
        proj = _proj(g, cam)
        bg = jnp.asarray([0.2, 0.3, 0.4])
        rgb_ref, depth_ref, alpha_ref, tidx_ref = rasterize_pixels_reference(
            proj, jnp.asarray(g["colors"]), jnp.asarray(opac), bg, W, H
        )
        out = R.render(
            jnp.asarray(g["xyz"]),
            jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]),
            jnp.asarray(opac),
            None,
            cam, W, H, bg,
            colors_precomp=jnp.asarray(g["colors"]),
            interpret=True,
        )
        return (rgb_ref, depth_ref, alpha_ref, tidx_ref), out

    def test_forward_image_matches(self):
        (rgb_ref, depth_ref, alpha_ref, tidx_ref), out = self._render_both()
        assert int(out["n_dropped"]) == 0
        np.testing.assert_allclose(out["render"], rgb_ref, atol=2e-5)
        np.testing.assert_allclose(out["depth"], depth_ref, atol=2e-4)
        np.testing.assert_allclose(out["alpha"], alpha_ref, atol=2e-5)
        agree = np.mean(np.asarray(out["tidx"]) == np.asarray(tidx_ref))
        assert agree > 0.99  # ties may differ

    def test_forward_dense_occlusion(self):
        # high opacity -> exercises the T<1e-4 done latch
        (rgb_ref, *_), out = self._render_both(n=300, seed=7, opacity_boost=4.0)
        np.testing.assert_allclose(out["render"], rgb_ref, atol=5e-5)

    def test_gradients_match_oracle(self):
        g, cam = scene(100, seed=2)
        opac = _sigmoid(g["opacity_logit"]).astype(np.float32)
        bg = jnp.asarray([0.0, 0.0, 0.0])
        target = jnp.asarray(
            np.random.default_rng(9).uniform(0, 1, (H, W, 3)), jnp.float32
        )

        def loss_oracle(xyz, log_s, rot, op, col):
            rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
            proj = projection.project_from_params(
                xyz, jnp.exp(log_s), rot, cam, W, H
            )
            rgb, depth, alpha, _ = rasterize_pixels_reference(
                proj, col, op, bg, W, H
            )
            return jnp.mean((rgb - target) ** 2) + 0.1 * jnp.mean(depth)

        def loss_pallas(xyz, log_s, rot, op, col):
            out = R.render(
                xyz, jnp.exp(log_s), rot, op, None, cam, W, H, bg,
                colors_precomp=col, interpret=True,
            )
            return jnp.mean((out["render"] - target) ** 2) + 0.1 * jnp.mean(
                out["depth"]
            )

        args = (
            jnp.asarray(g["xyz"]), jnp.asarray(g["log_scales"]),
            jnp.asarray(g["rotation"]), jnp.asarray(opac),
            jnp.asarray(g["colors"]),
        )
        g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
        g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["xyz", "log_scales", "rotation", "opacity", "colors"]
        for name, a, b in zip(names, g_ref, g_pal):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4 * scale + 1e-8,
                err_msg=f"grad mismatch: {name}",
            )

    def test_sh_render_and_grads(self):
        g, cam = scene(60, seed=11)
        opac = _sigmoid(g["opacity_logit"]).astype(np.float32)
        bg = jnp.asarray([1.0, 1.0, 1.0])
        K = 16
        rng = np.random.default_rng(13)
        shs = jnp.asarray(
            rng.normal(size=(60, 3, K)).astype(np.float32) * 0.3
        )

        def loss(shs_):
            out = R.render(
                jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
                jnp.asarray(g["rotation"]), jnp.asarray(opac), shs_,
                cam, W, H, bg, sh_degree=2, interpret=True,
            )
            return jnp.mean(out["render"])

        val, grads = jax.value_and_grad(loss)(shs)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grads)).all()
        assert float(jnp.abs(grads).max()) > 0

    def test_means2d_gradient_carrier(self):
        g, cam = scene(80, seed=12)
        opac = _sigmoid(g["opacity_logit"] + 1.0).astype(np.float32)
        bg = jnp.asarray([0.0, 0.0, 0.0])

        def loss(dummy):
            out = R.render(
                jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
                jnp.asarray(g["rotation"]), jnp.asarray(opac), None,
                cam, W, H, bg, colors_precomp=jnp.asarray(g["colors"]),
                means2d_dummy=dummy, interpret=True,
            )
            return jnp.mean(out["render"] ** 2)

        grad = jax.grad(loss)(jnp.zeros((80, 2)))
        assert np.isfinite(np.asarray(grad)).all()
        # visible gaussians should receive nonzero screen-space grads
        proj = _proj(g, cam)
        vis = np.asarray(proj.visible)
        norms = np.linalg.norm(np.asarray(grad), axis=-1)
        assert norms[vis].max() > 0
        assert np.allclose(norms[~vis], 0.0)


class TestCov3DPrecomp:
    def test_matches_scale_rot_path(self):
        from gaussianprediction_tpu.utils.math import (
            covariance_from_scaling_rotation,
        )

        g, cam = scene(80, seed=21)
        opac = _sigmoid(g["opacity_logit"]).astype(np.float32)
        scaling = jnp.exp(jnp.asarray(g["log_scales"]))
        rot = jnp.asarray(g["rotation"])
        rot_n = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        cov6 = covariance_from_scaling_rotation(scaling, rot_n)
        kw = dict(colors_precomp=jnp.asarray(g["colors"]), interpret=True)
        a = R.render(jnp.asarray(g["xyz"]), scaling, rot,
                     jnp.asarray(opac), None, cam, W, H, jnp.zeros(3), **kw)
        b = R.render(jnp.asarray(g["xyz"]), scaling, rot,
                     jnp.asarray(opac), None, cam, W, H, jnp.zeros(3),
                     cov3d_precomp=cov6, **kw)
        np.testing.assert_allclose(a["render"], b["render"], atol=1e-5)


class TestLargeFootprints:
    """Footprint-cap fidelity (VERDICT r1 weak #4): splats covering far
    more than 64 tiles — e.g. right after an opacity reset — must render
    exactly (the round-1 max_tiles=64 top-left truncation silently biased
    them); under a forced tiny cap, the kept sub-rect must stay centered
    on the mean."""

    def _big_scene(self, wb, hb, n=24, seed=11):
        # scales large enough that every splat covers most of the image
        g = random_gaussians(n, seed=seed, scale_range=(-0.8, -0.2))
        cam = orbit_camera(0.4, width=wb, height=hb, uid=0)
        return g, cam.to_device_dict()

    def test_over_64_tile_splats_match_oracle(self):
        wb = hb = 160  # 10x10 grid: full-image splats are ~100 tiles > 64
        g, cam = self._big_scene(wb, hb)
        opac = _sigmoid(g["opacity_logit"]).astype(np.float32)
        rot = g["rotation"] / np.linalg.norm(
            g["rotation"], axis=-1, keepdims=True
        )
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(rot), cam, wb, hb,
        )
        area = np.asarray(
            (proj.tiles_max[:, 0] - proj.tiles_min[:, 0])
            * (proj.tiles_max[:, 1] - proj.tiles_min[:, 1])
        )
        assert area.max() > 64, "fixture must exceed the old 64-tile cap"
        bg = jnp.asarray([0.15, 0.1, 0.2])
        rgb_ref, depth_ref, _, _ = rasterize_pixels_reference(
            proj, jnp.asarray(g["colors"]), jnp.asarray(opac), bg, wb, hb
        )
        out = R.render(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), jnp.asarray(opac), None, cam,
            wb, hb, bg, colors_precomp=jnp.asarray(g["colors"]),
            interpret=True, capacity_multiplier=128,
        )
        assert int(out["n_dropped"]) == 0
        np.testing.assert_allclose(out["render"], rgb_ref, atol=2e-5)
        np.testing.assert_allclose(out["depth"], depth_ref, atol=2e-4)

    def test_forced_cap_keeps_mean_tile(self):
        from gaussianprediction_tpu.ops import instance_stream as IS

        wb = hb = 160
        g, cam = self._big_scene(wb, hb, n=8, seed=13)
        rot = g["rotation"] / np.linalg.norm(
            g["rotation"], axis=-1, keepdims=True
        )
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(rot), cam, wb, hb,
        )
        x0, y0, rw, rh = IS._capped_rect(
            proj.tiles_min, proj.tiles_max, proj.mean2d, 9
        )
        x0, y0, rw, rh = map(np.asarray, (x0, y0, rw, rh))
        tmin = np.asarray(proj.tiles_min)
        tmax = np.asarray(proj.tiles_max)
        ct = np.asarray(proj.mean2d) // 16
        vis = np.asarray(proj.visible)
        for i in np.nonzero(vis)[0]:
            assert rw[i] * rh[i] <= 9
            # sub-rect within the original rect
            assert tmin[i, 0] <= x0[i] and x0[i] + rw[i] <= tmax[i, 0]
            assert tmin[i, 1] <= y0[i] and y0[i] + rh[i] <= tmax[i, 1]
            if rw[i] < 1 or rh[i] < 1:
                continue
            # the (clamped) mean tile is inside the kept sub-rect
            cx = np.clip(ct[i, 0], tmin[i, 0], tmax[i, 0] - 1)
            cy = np.clip(ct[i, 1], tmin[i, 1], tmax[i, 1] - 1)
            assert x0[i] <= cx < x0[i] + rw[i]
            assert y0[i] <= cy < y0[i] + rh[i]


class TestMultiTileBlend:
    """GPT_BLEND_MT=1 contiguous multi-tile kernels vs the classic
    one-tile-per-program kernels: same math per (tile, chunk) pair, so
    images and gradients must agree (bit-exact at tpb=1 where the chunk
    partition is identical; allclose at tpb>1 where the window alignment
    re-associates the transmittance products)."""

    def _run(self, env, n=220, seed=3, opacity_boost=2.0):
        import os
        g, cam = scene(n, seed=seed)
        opac = _sigmoid(g["opacity_logit"] + opacity_boost).astype(np.float32)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        target = jnp.asarray(
            np.random.default_rng(5).uniform(0, 1, (H, W, 3)), jnp.float32
        )
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            def loss(xyz, log_s, rot, op, col):
                out = R.render(
                    xyz, jnp.exp(log_s), rot, op, None, cam, W, H, bg,
                    colors_precomp=col, interpret=True,
                )
                return (
                    jnp.mean((out["render"] - target) ** 2)
                    + 0.1 * jnp.mean(out["depth"]),
                    out,
                )

            args = (
                jnp.asarray(g["xyz"]), jnp.asarray(g["log_scales"]),
                jnp.asarray(g["rotation"]), jnp.asarray(opac),
                jnp.asarray(g["colors"]),
            )
            (l, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3, 4), has_aux=True
            )(*args)
            return out, grads
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def test_tpb1_matches_classic(self):
        """tpb=1 has the identical chunk partition, so the FORWARD is
        bit-exact. The backward math is identical too, but in interpret
        mode the pl.when->lax.cond wrapper changes XLA:CPU's matmul
        reduction association (~1 ulp on the mon_dot outputs), so grads
        are compared at float-noise tolerance."""
        out_c, g_c = self._run({})
        out_m, g_m = self._run({"GPT_BLEND_MT": "1", "GPT_BLEND_TPB": "1"})
        np.testing.assert_array_equal(
            np.asarray(out_m["render"]), np.asarray(out_c["render"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_m["tidx"]), np.asarray(out_c["tidx"])
        )
        for a, b in zip(g_m, g_c):
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5 * scale,
            )

    def test_tpb4_matches(self):
        out_c, g_c = self._run({})
        out_m, g_m = self._run({"GPT_BLEND_MT": "1", "GPT_BLEND_TPB": "4"})
        np.testing.assert_allclose(
            np.asarray(out_m["render"]), np.asarray(out_c["render"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_m["depth"]), np.asarray(out_c["depth"]),
            atol=1e-4,
        )
        names = ["xyz", "log_scales", "rotation", "opacity", "colors"]
        for name, a, b in zip(names, g_m, g_c):
            scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4 * scale + 1e-8,
                err_msg=f"grad mismatch: {name}",
            )

    def test_tpb4_vs_oracle_dense(self):
        """MT kernels against the exact jnp oracle under heavy occlusion
        (done-latch heavy path), including the uneven last program."""
        import os
        g, cam = scene(300, seed=7)
        opac = _sigmoid(g["opacity_logit"] + 4.0).astype(np.float32)
        proj = _proj(g, cam)
        bg = jnp.asarray([0.2, 0.3, 0.4])
        rgb_ref, depth_ref, alpha_ref, _ = rasterize_pixels_reference(
            proj, jnp.asarray(g["colors"]), jnp.asarray(opac), bg, W, H
        )
        old = os.environ.get("GPT_BLEND_MT")
        os.environ["GPT_BLEND_MT"] = "1"
        try:
            out = R.render(
                jnp.asarray(g["xyz"]),
                jnp.exp(jnp.asarray(g["log_scales"])),
                jnp.asarray(g["rotation"]), jnp.asarray(opac), None,
                cam, W, H, bg, colors_precomp=jnp.asarray(g["colors"]),
                interpret=True,
            )
        finally:
            if old is None:
                os.environ.pop("GPT_BLEND_MT", None)
            else:
                os.environ["GPT_BLEND_MT"] = old
        assert int(out["n_dropped"]) == 0
        np.testing.assert_allclose(out["render"], rgb_ref, atol=5e-5)
        np.testing.assert_allclose(out["alpha"], alpha_ref, atol=2e-5)
