"""KNN / FPS / k-means / hash-grid correctness vs brute force (SURVEY §4c)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.ops import fps, hashgrid, kmeans, knn


def rnd(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


class TestKNN:
    def test_matches_bruteforce(self):
        q, p = rnd(100, 3, seed=1), rnd(50, 3, seed=2)
        d, i = knn.knn(jnp.asarray(q), jnp.asarray(p), 4)
        full = ((q[:, None] - p[None]) ** 2).sum(-1)
        bi = np.argsort(full, axis=1, kind="stable")[:, :4]
        bd = np.take_along_axis(full, bi, axis=1)
        np.testing.assert_allclose(np.sort(d, 1), np.sort(bd, 1), atol=1e-4)
        # sets of neighbors equal (ordering within ties may differ)
        for r in range(100):
            assert set(np.asarray(i)[r].tolist()) == set(bi[r].tolist())

    def test_blocked_path(self):
        q, p = rnd(5000, 3, seed=3), rnd(64, 3, seed=4)
        d1, i1 = knn.knn(jnp.asarray(q), jnp.asarray(p), 3, block=1024)
        d2, i2 = knn.knn(jnp.asarray(q), jnp.asarray(p), 3, block=8192)
        np.testing.assert_allclose(d1, d2, atol=1e-4)
        np.testing.assert_array_equal(i1, i2)

    def test_point_valid_mask(self):
        q, p = rnd(10, 3, seed=5), rnd(20, 3, seed=6)
        valid = jnp.zeros(20, bool).at[:5].set(True)
        _, i = knn.knn(jnp.asarray(q), jnp.asarray(p), 3, point_valid=valid)
        assert (np.asarray(i) < 5).all()

    def test_mean_knn_sq_dist_excludes_self(self):
        # 4 points on a line at 0,1,2,3: NN dists^2 of point 0 are 1,4,9
        p = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]])
        d = knn.mean_knn_sq_dist(p, k=3)
        assert float(d[0]) == pytest.approx((1 + 4 + 9) / 3, abs=1e-5)
        assert float(d[1]) == pytest.approx((1 + 1 + 4) / 3, abs=1e-5)

    def test_hybrid_concat(self):
        xyz, feat = rnd(30, 3, seed=7), rnd(30, 8, seed=8)
        kx, kf = rnd(6, 3, seed=9), rnd(6, 8, seed=10)
        d, i = knn.hybrid_knn(
            jnp.asarray(xyz), jnp.asarray(feat), jnp.asarray(kx),
            jnp.asarray(kf), 2, feature_amplify=5.0,
        )
        qc = np.concatenate([xyz, feat * 5.0], -1)
        pc = np.concatenate([kx, kf * 5.0], -1)
        full = ((qc[:, None] - pc[None]) ** 2).sum(-1)
        bi = np.argsort(full, 1)[:, :2]
        for r in range(30):
            assert set(np.asarray(i)[r].tolist()) == set(bi[r].tolist())


class TestFPS:
    def test_spreads_points(self):
        # clusters far apart: FPS must pick one from each before repeats
        pts = np.concatenate([
            rnd(50, 3, seed=11) * 0.1 + np.array(c)
            for c in ([0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10])
        ]).astype(np.float32)
        idx = fps.furthest_point_sampling(jnp.asarray(pts), 4)
        clusters = set(int(i) // 50 for i in np.asarray(idx))
        assert clusters == {0, 1, 2, 3}

    def test_respects_valid_mask(self):
        pts = rnd(100, 3, seed=12)
        valid = jnp.zeros(100, bool).at[40:60].set(True)
        idx = np.asarray(fps.furthest_point_sampling(jnp.asarray(pts), 8,
                                                     valid=valid))
        assert ((idx >= 40) & (idx < 60)).all()


class TestKMeans:
    def test_separable_clusters(self):
        rng = np.random.default_rng(13)
        centers = np.array([[0, 0, 0], [20, 0, 0], [0, 20, 0]], np.float32)
        pts = np.concatenate(
            [rng.normal(c, 0.5, (100, 3)) for c in centers]
        ).astype(np.float32)
        c, assign = kmeans.kmeans(
            jnp.asarray(pts), 3, jax.random.PRNGKey(0), n_iters=25
        )
        c = np.asarray(c)
        # every true center has a centroid within 0.5
        for tc in centers:
            assert np.min(np.linalg.norm(c - tc, axis=1)) < 0.5
        # members agree
        a = np.asarray(assign)
        for g in range(3):
            vals = a[g * 100:(g + 1) * 100]
            assert (vals == vals[0]).all()

    def test_feature_kmeans_mean_xyz(self):
        xyz = rnd(200, 3, seed=14)
        feats = jnp.concatenate(
            [jnp.asarray(xyz), jnp.asarray(rnd(200, 4, seed=15))], -1
        )
        sx, sf = kmeans.feature_kmeans(
            jnp.asarray(xyz), feats, 5, jax.random.PRNGKey(1), n_iters=10
        )
        assert sx.shape == (5, 3) and sf.shape == (5, 7)
        assert np.isfinite(np.asarray(sx)).all()

    def test_valid_mask(self):
        xyz = rnd(50, 3, seed=16) + 100.0  # far-away invalid points
        xyz[:25] -= 100.0
        valid = jnp.arange(50) < 25
        c, assign = kmeans.kmeans(
            jnp.asarray(xyz), 3, jax.random.PRNGKey(2), n_iters=10,
            valid=valid,
        )
        assert np.abs(np.asarray(c)).max() < 10  # centroids near valid pts


class TestHashGrid:
    def test_encode_shapes_and_grads(self):
        key = jax.random.PRNGKey(3)
        tables = hashgrid.init_hashgrid(key, n_levels=4, n_features=2,
                                        log2_T=10)
        xyz = jnp.asarray(rnd(32, 3, seed=17))

        def f(t):
            return jnp.sum(hashgrid.hashgrid_encode(t, xyz) ** 2)

        out = hashgrid.hashgrid_encode(tables, xyz)
        assert out.shape == (32, 8)
        g = jax.grad(f)(tables)
        total = sum(float(jnp.abs(v).sum()) for v in g.values())
        assert np.isfinite(total) and total > 0

    def test_fast_vjp_matches_ad(self):
        """hashgrid_encode_fast: fwd identical to the plain encode; table
        grads (sort-based VJP, both XLA and Pallas-interpret scatter paths)
        identical to jax AD of the plain encode; xyz grads are zero by
        contract (the call site stop-gradients xyz)."""
        key = jax.random.PRNGKey(6)
        tables = hashgrid.init_hashgrid(key, n_levels=4, n_features=2,
                                        log2_T=10, n_min=4, max_res=32)
        xyz = jnp.asarray(rnd(137, 3, seed=19) * 1.4)
        cot = jnp.asarray(rnd(137, 8, seed=20))

        e0 = hashgrid.hashgrid_encode(tables, xyz, bound=1.6, n_min=4,
                                      max_res=32)
        e1 = hashgrid.hashgrid_encode_fast(tables, xyz, 1.6, 4, 32)
        np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-6)

        def loss_ref(t):
            return jnp.sum(
                hashgrid.hashgrid_encode(t, xyz, bound=1.6, n_min=4,
                                         max_res=32) * cot
            )

        g_ref = jax.grad(loss_ref)(tables)
        for backend in ("xla", "pallas"):
            g_fast, g_xyz = jax.grad(
                lambda t, x: jnp.sum(
                    hashgrid.hashgrid_encode_fast(t, x, 1.6, 4, 32, backend)
                    * cot
                ),
                argnums=(0, 1),
            )(tables, xyz)
            for k in tables:
                np.testing.assert_allclose(
                    np.asarray(g_ref[k]), np.asarray(g_fast[k]), atol=1e-5,
                    err_msg=f"{backend}:{k}",
                )
            assert float(jnp.abs(g_xyz).max()) == 0.0

    def test_sorted_gather_fwd_bitexact(self):
        """_encode_from_flat_sorted (per-level sort + monotone gather +
        sort-back) must equal the flat random gather bit-for-bit: same
        adds in the same per-point order, only the gather is reordered."""
        key = jax.random.PRNGKey(9)
        tables = hashgrid.init_hashgrid(key, n_levels=6, n_features=4,
                                        log2_T=10, n_min=4, max_res=64)
        xyz = jnp.asarray(rnd(513, 3, seed=23) * 1.5)
        specs, _ = hashgrid.hashgrid_specs(tables, 4, 64)
        keys, w = hashgrid.hashgrid_keys_weights(xyz, specs, 1.6)
        flat = hashgrid._flat_tables(tables)
        a = hashgrid._encode_from_flat(flat, keys, w)
        b = hashgrid._encode_from_flat_sorted(flat, keys, w)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fourier_encoder(self):
        from gaussianprediction_tpu.ops import fourier_enc

        B = fourier_enc.fourier_dirs(4, 2, n_min=4, max_res=32)
        assert B.shape == (3, 8)
        # deterministic across calls
        B2 = fourier_enc.fourier_dirs(4, 2, n_min=4, max_res=32)
        np.testing.assert_array_equal(np.asarray(B), np.asarray(B2))
        xyz = jnp.asarray(rnd(16, 3, seed=21))
        f = fourier_enc.fourier_encode(B, xyz)
        assert f.shape == (16, fourier_enc.fourier_feature_dim(4, 2))
        assert np.all(np.isfinite(np.asarray(f)))
        # sin^2 + cos^2 == 1 per column pair
        s, c = np.asarray(f[:, :8]), np.asarray(f[:, 8:])
        np.testing.assert_allclose(s * s + c * c, 1.0, atol=1e-5)
        # continuity
        f1 = fourier_enc.fourier_encode(B, xyz + 1e-6)
        assert float(jnp.abs(f1 - f).max()) < 1e-3

    def test_brick_encoder_matches_naive(self):
        """brickgrid_encode_fast fwd == a naive 8-corner reimplementation
        of the same brick-table function; table grads == jax AD of the
        naive form; xyz grads are zero by contract."""
        key = jax.random.PRNGKey(11)
        tables = hashgrid.init_brickgrid(key, n_levels=4, n_features=2,
                                         log2_Tb=7, n_min=4, max_res=32)
        xyz = jnp.asarray(rnd(151, 3, seed=29) * 1.5)
        specs, _ = hashgrid.brick_specs(tables, 4, 32)
        F = 2
        B = hashgrid.BRICK

        def naive(t):
            flat = jnp.concatenate(
                [t[f"level_{l}"] for l in range(4)], axis=0
            ).reshape(-1, B, B, B, F)
            bidx, a, f = hashgrid._brick_geom(xyz, specs, 1.6)
            outs = []
            for l in range(4):
                feat = 0.0
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dz in (0, 1):
                            w = (
                                jnp.where(dx == 1, f[l, :, 0],
                                          1 - f[l, :, 0])
                                * jnp.where(dy == 1, f[l, :, 1],
                                            1 - f[l, :, 1])
                                * jnp.where(dz == 1, f[l, :, 2],
                                            1 - f[l, :, 2])
                            )
                            cell = flat[
                                bidx[l], a[l, :, 0] + dx,
                                a[l, :, 1] + dy, a[l, :, 2] + dz]
                            feat = feat + w[:, None] * cell
                outs.append(feat)
            return jnp.concatenate(outs, axis=-1)

        e0 = naive(tables)
        e1 = hashgrid.brickgrid_encode_fast(tables, xyz, 1.6, 4, 32)
        np.testing.assert_allclose(np.asarray(e0), np.asarray(e1),
                                   atol=1e-6)

        cot = jnp.asarray(rnd(151, 8, seed=31))
        g_ref = jax.grad(lambda t: jnp.sum(naive(t) * cot))(tables)
        g_fast, g_xyz = jax.grad(
            lambda t, x: jnp.sum(
                hashgrid.brickgrid_encode_fast(t, x, 1.6, 4, 32) * cot
            ),
            argnums=(0, 1),
        )(tables, xyz)
        for k in tables:
            np.testing.assert_allclose(
                np.asarray(g_ref[k]), np.asarray(g_fast[k]), atol=1e-5,
                err_msg=k,
            )
        assert float(jnp.abs(g_xyz).max()) == 0.0

    def test_brick_encoder_continuity_and_boundary(self):
        key = jax.random.PRNGKey(13)
        tables = hashgrid.init_brickgrid(key, n_levels=4, n_features=2,
                                         log2_Tb=8, n_min=4, max_res=32)
        xyz = jnp.asarray(rnd(64, 3, seed=37) * 1.55)
        e0 = hashgrid.brickgrid_encode_fast(tables, xyz, 1.6, 4, 32)
        e1 = hashgrid.brickgrid_encode_fast(tables, xyz + 1e-6, 1.6, 4, 32)
        assert float(jnp.abs(e1 - e0).max()) < 1e-3
        edge = jnp.asarray([[1.6, 1.6, 1.6], [-1.6, -1.6, -1.6],
                            [2.0, 0.0, -2.0]], jnp.float32)
        ee = hashgrid.brickgrid_encode_fast(tables, edge, 1.6, 4, 32)
        assert np.all(np.isfinite(np.asarray(ee)))

    def test_interpolation_continuity(self):
        # moving a point slightly moves features slightly (trilinear)
        key = jax.random.PRNGKey(4)
        tables = hashgrid.init_hashgrid(key, n_levels=4, n_features=2,
                                        log2_T=12)
        x0 = jnp.asarray([[0.1, 0.2, 0.3]])
        f0 = hashgrid.hashgrid_encode(tables, x0)
        f1 = hashgrid.hashgrid_encode(tables, x0 + 1e-5)
        assert float(jnp.abs(f1 - f0).max()) < 1e-4

    def test_dense_levels_collision_free(self):
        res = hashgrid.level_resolutions(16, 16, 2048)
        assert res[0] == 16 and res[-1] == 2048
        assert hashgrid.level_table_size(16, 19) == 17**3  # dense
        assert hashgrid.level_table_size(2048, 19) == 2**19  # hashed

    def test_mlp_matches_manual(self):
        key = jax.random.PRNGKey(5)
        params = hashgrid.init_mlp(key, [4, 8, 2])
        x = jnp.asarray(rnd(10, 4, seed=18))
        out = hashgrid.mlp_apply(params, x)
        manual = np.maximum(
            np.asarray(x) @ np.asarray(params[0]["w"])
            + np.asarray(params[0]["b"]), 0,
        ) @ np.asarray(params[1]["w"]) + np.asarray(params[1]["b"])
        np.testing.assert_allclose(out, manual, atol=1e-5)


class TestPointopsSecondary:
    """pointops grouping/subtraction/aggregation/interpolation
    (ops/pointops.py) vs direct numpy + torch-gradient parity."""

    def test_grouping_and_backward(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import pointops as P
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 10, (6, 3)).astype(np.int32))
        out = P.grouping(x, idx)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(x)[np.asarray(idx)])
        # backward = scatter-add of cotangents (grouping_backward_cuda)
        g = jax.grad(lambda x: jnp.sum(P.grouping(x, idx) * 2.0))(x)
        expect = np.zeros((10, 4), np.float32)
        for i in np.asarray(idx).reshape(-1):
            expect[i] += 2.0
        np.testing.assert_allclose(np.asarray(g), expect)

    def test_subtraction(self):
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import pointops as P
        rng = np.random.default_rng(1)
        a = rng.normal(size=(5, 3)).astype(np.float32)
        b = rng.normal(size=(5, 3)).astype(np.float32)
        idx = rng.integers(0, 5, (5, 2)).astype(np.int32)
        out = np.asarray(P.subtraction(jnp.asarray(a), jnp.asarray(b),
                                       jnp.asarray(idx)))
        for i in range(5):
            for j in range(2):
                np.testing.assert_allclose(out[i, j], a[i] - b[idx[i, j]],
                                           rtol=1e-6)

    def test_aggregation_weight_channel_sharing(self):
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import pointops as P
        rng = np.random.default_rng(2)
        n, k, c, w_c = 4, 3, 6, 2
        inp = rng.normal(size=(n, c)).astype(np.float32)
        pos = rng.normal(size=(n, k, c)).astype(np.float32)
        w = rng.normal(size=(n, k, w_c)).astype(np.float32)
        idx = rng.integers(0, n, (n, k)).astype(np.int32)
        out = np.asarray(P.aggregation(*map(jnp.asarray, (inp, pos, w, idx))))
        expect = np.zeros((n, c), np.float32)
        for i in range(n):
            for j in range(k):
                for cc in range(c):
                    expect[i, cc] += (inp[idx[i, j], cc] + pos[i, j, cc]) \
                        * w[i, j, cc % w_c]
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_interpolation_idw(self):
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import pointops as P
        # feature field linear in x: IDW interpolation of a constant
        # must reproduce the constant; near-coincident target must return
        # (nearly) the source value
        src = np.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                         np.float32)
        feat = np.asarray([[1.0], [1.0], [1.0], [1.0]], np.float32)
        out = np.asarray(P.interpolation(jnp.asarray(src),
                                         jnp.asarray([[0.5, 0.5, 0.0]]),
                                         jnp.asarray(feat)))
        np.testing.assert_allclose(out, [[1.0]], rtol=1e-6)
        feat2 = np.asarray([[0.0], [5.0], [7.0], [9.0]], np.float32)
        out2 = np.asarray(P.interpolation(
            jnp.asarray(src), jnp.asarray([[1.0, 1e-5, 0.0]]),
            jnp.asarray(feat2)))
        assert abs(float(out2[0, 0]) - 5.0) < 1e-2

    def test_queryandgroup_centers_xyz(self):
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import pointops as P
        rng = np.random.default_rng(3)
        xyz = rng.normal(size=(20, 3)).astype(np.float32)
        feat = rng.normal(size=(20, 2)).astype(np.float32)
        out = np.asarray(P.queryandgroup(4, jnp.asarray(xyz), None,
                                         jnp.asarray(feat)))
        assert out.shape == (20, 4, 5)
        # self is its own nearest neighbor -> first grouped xyz is ~0
        np.testing.assert_allclose(out[:, 0, :3], 0.0, atol=1e-5)
