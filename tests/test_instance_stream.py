"""Fast (instance_stream) vs slow (binning+gather) path cross-validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.data.synthetic import orbit_camera, random_gaussians
from gaussianprediction_tpu.ops import instance_stream, projection
from gaussianprediction_tpu.ops import rasterize as R
from gaussianprediction_tpu.ops import rasterize_pallas as rp

W, H = 64, 48


def scene(n=150, seed=1):
    g = random_gaussians(n, seed=seed, scale_range=(-3.4, -2.2))
    cam = orbit_camera(0.4, width=W, height=H, uid=0).to_device_dict()
    opac = (1 / (1 + np.exp(-g["opacity_logit"]))).astype(np.float32)
    return g, cam, opac


def render_with(fast, g, cam, opac, **kw):
    return R.render(
        jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
        jnp.asarray(g["rotation"]), jnp.asarray(opac), None, cam, W, H,
        jnp.asarray([0.1, 0.2, 0.3]),
        colors_precomp=jnp.asarray(g["colors"]), interpret=True,
        fast_binning=fast, **kw,
    )


class TestFastVsSlowBinning:
    def test_images_identical(self):
        g, cam, opac = scene()
        fast = render_with(True, g, cam, opac)
        slow = render_with(False, g, cam, opac)
        assert int(fast["n_dropped"]) == 0
        assert int(slow["n_dropped"]) == 0
        np.testing.assert_allclose(
            fast["render"], slow["render"], atol=1e-6
        )
        np.testing.assert_allclose(fast["depth"], slow["depth"], atol=1e-5)
        np.testing.assert_array_equal(fast["tidx"], slow["tidx"])

    def test_gradients_identical(self):
        g, cam, opac = scene(120, seed=3)

        def loss(fast, xyz, op, col):
            out = R.render(
                xyz, jnp.exp(jnp.asarray(g["log_scales"])),
                jnp.asarray(g["rotation"]), op, None, cam, W, H,
                jnp.zeros(3), colors_precomp=col, interpret=True,
                fast_binning=fast,
            )
            return jnp.mean(out["render"] ** 2) + 0.01 * jnp.mean(
                out["depth"]
            )

        args = (jnp.asarray(g["xyz"]), jnp.asarray(opac),
                jnp.asarray(g["colors"]))
        gf = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2))(*args)
        gs = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2))(*args)
        for a, b in zip(gf, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_dropped_accounting_footprint_cap(self):
        g, cam, opac = scene(60, seed=5)
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), cam, W, H,
        )
        feat = jnp.zeros((60, 10))
        grid_x, grid_y = 4, 3
        full = instance_stream.build_instances(
            feat, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            grid_x, grid_y, 4096, 64,
        )
        capped = instance_stream.build_instances(
            feat, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            grid_x, grid_y, 4096, 2,
        )
        assert int(full.n_dropped) == 0
        assert int(capped.n_dropped) > 0

    def test_alignment_and_validity_invariants(self):
        g, cam, opac = scene(100, seed=7)
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), cam, W, H,
        )
        feat = jnp.asarray(
            np.random.default_rng(0).normal(size=(100, 10)), jnp.float32
        )
        # packing convention: feat channel 9 IS the depth (C_Z) — the
        # no-depth-sort stream orders within-tile instances by it
        feat = feat.at[:, 9].set(proj.depth)
        stream = instance_stream.build_instances(
            feat, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            4, 3, 4096, 64,
        )
        starts = np.asarray(stream.tile_start)
        ends = np.asarray(stream.tile_end)
        inst = np.asarray(stream.inst).T  # SoA [16, P'] -> rows
        # segments are UNALIGNED (round 3) but contiguous and ordered:
        # tile t+1 starts exactly where tile t ends
        assert (ends >= starts).all()
        np.testing.assert_array_equal(starts[1:], ends[:-1])
        assert starts[0] == 0
        gid = inst[:, rp.C_GID]
        validch = inst[:, rp.C_VALID]
        for t in range(12):
            seg = slice(starts[t], ends[t])
            assert (gid[seg] >= 0).all(), f"tile {t} has padding inside"
            assert (validch[seg] == 1.0).all()
            # depth order within tile (feat here is noise; order by the
            # actual per-gaussian depth of the gid channel)
            z = np.asarray(proj.depth)[gid[seg].astype(int)]
            assert (np.diff(z) >= -1e-5).all()

    def test_backward_reduction_matches_ad_of_slow_path(self):
        """The custom sorted-run-reduction VJP must equal autodiff of an
        equivalent gather-based packing."""
        g, cam, opac = scene(50, seed=9)
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), cam, W, H,
        )
        rng = np.random.default_rng(1)
        feat0 = jnp.asarray(rng.normal(size=(50, 10)), jnp.float32)
        cot = None

        def f_fast(feat):
            s = instance_stream.build_instances(
                feat, proj.depth, proj.tiles_min, proj.tiles_max,
                proj.visible, 4, 3, 2048, 64,
            )
            return jnp.sum(s.inst[:10] * weights.T)

        # random cotangent field over instances
        s0 = instance_stream.build_instances(
            feat0, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            4, 3, 2048, 64,
        )
        weights = jnp.asarray(
            rng.normal(size=(s0.inst.shape[1], 10)), jnp.float32
        )
        grad_fast = jax.grad(f_fast)(feat0)

        # reference gradient: per-gaussian sum of weights over its instances
        gid = np.asarray(s0.inst[rp.C_GID]).astype(int)
        ref = np.zeros((50, 10), np.float32)
        wnp = np.asarray(weights)
        for j, gg in enumerate(gid):
            if gg >= 0:
                ref[gg] += wnp[j]
        np.testing.assert_allclose(np.asarray(grad_fast), ref, atol=1e-4)

    def test_backward_correct_under_capacity_overflow(self):
        """Regression (ADVICE r1 #1): when instances are dropped at the
        capacity limit, run boundaries in the backward must be derived from
        KEPT counts — raw counts shift every gradient, corrupting even
        never-dropped Gaussians."""
        g, cam, opac = scene(80, seed=11)
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), cam, W, H,
        )
        rng = np.random.default_rng(2)
        feat0 = jnp.asarray(rng.normal(size=(80, 10)), jnp.float32)
        capacity = 64  # force drops

        s0 = instance_stream.build_instances(
            feat0, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            4, 3, capacity, 64,
        )
        assert int(s0.n_dropped) > 0, "fixture must overflow"
        weights = jnp.asarray(
            rng.normal(size=(s0.inst.shape[1], 10)), jnp.float32
        )

        def f(feat):
            s = instance_stream.build_instances(
                feat, proj.depth, proj.tiles_min, proj.tiles_max,
                proj.visible, 4, 3, capacity, 64,
            )
            return jnp.sum(s.inst[:10] * weights.T)

        grad_fast = jax.grad(f)(feat0)
        gid = np.asarray(s0.inst[rp.C_GID]).astype(int)
        ref = np.zeros((80, 10), np.float32)
        wnp = np.asarray(weights)
        for j, gg in enumerate(gid):
            if gg >= 0:
                ref[gg] += wnp[j]
        np.testing.assert_allclose(np.asarray(grad_fast), ref, atol=1e-4)
