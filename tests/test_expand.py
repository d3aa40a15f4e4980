"""Direct unit tests for the Pallas expand kernel (ops/expand_pallas.py).

The integration path (build_instances vs the binning oracle) is covered in
test_instance_stream.py; these tests pin the kernel's window-coverage
proof at its exact boundary: a 128-slot block may touch up to 129
consecutive candidates, and the two 128-wide windows cover them with ZERO
slack when g0 = (q+1)*W - 1.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gaussianprediction_tpu.ops import expand_pallas as EXP


def _run(counts, grid_x=8, capacity=None, tminx=None, tminy=None):
    """Build permat/offs from per-Gaussian instance counts (depth order,
    already compacted: all counts >= 1), run the kernel, return the
    [16, capacity] SoA plus the numpy reference expansion."""
    counts = np.asarray(counts, np.int64)
    n = len(counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    total = int(counts.sum())
    if capacity is None:
        capacity = total
    # mirror build_instances_fwd: the DROP policy honours the requested
    # capacity exactly (total is clamped to it); the buffer rounds up to
    # the kernel's STEP granularity with invalid tail slots
    total = min(total, capacity)
    capacity = ((capacity + EXP.ALIGN - 1) // EXP.ALIGN) * EXP.ALIGN
    assert capacity % EXP.ALIGN == 0
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(10, n)).astype(np.float32)
    if tminx is None:
        tminx = rng.integers(0, 4, n)
    if tminy is None:
        tminy = rng.integers(0, 4, n)
    rw = np.maximum(1, np.minimum(counts, 3)).astype(np.int32)
    # make counts consistent with a rect walk: count = rw * rh requires
    # counts divisible by rw; simplest exact choice is rw = 1
    rw = np.ones(n, np.int32)
    gid = np.arange(n, dtype=np.int32)

    W = EXP.WCAND
    qmax = max((n - 1) // W, 0)
    Np = (qmax + 2) * W
    pad = Np - n
    offs_row = np.concatenate(
        [offsets, np.full(pad, EXP.HUGE, np.int32)]
    )[None, :].astype(np.int32)
    permat = np.zeros((16, Np), np.float32)
    permat[0:10, :n] = feat
    permat[10, :n] = offsets
    permat[11, :n] = tminx
    permat[12, :n] = tminy
    permat[13, :n] = rw
    permat[14, :n] = gid

    nb = capacity // EXP.BSLOT
    block_starts = np.arange(nb, dtype=np.int64) * EXP.BSLOT
    g0 = np.maximum(
        np.searchsorted(offs_row[0], block_starts, side="right") - 1, 0
    )
    starts_q = (g0 // W).astype(np.int32)

    out = EXP.expand_rows(
        jnp.asarray(permat), jnp.asarray(offs_row), jnp.asarray(starts_q),
        jnp.asarray([total], jnp.int32), capacity, grid_x,
        sentinel=grid_x * grid_x, interpret=True,
    )
    out = np.asarray(out)

    # numpy reference
    ref = np.zeros((16, capacity), np.float32)
    ref[10, :] = -1.0
    ref[11, :] = grid_x * grid_x
    j = 0
    for i in range(n):
        for k in range(int(counts[i])):
            if j >= min(total, capacity):
                break
            ref[0:10, j] = feat[:, i]
            ref[10, j] = gid[i]
            ty = tminy[i] + k // rw[i]
            tx = tminx[i] + k % rw[i]
            ref[11, j] = ty * grid_x + tx
            j += 1
    return out, ref


class TestExpandKernel:
    def test_uniform_counts(self):
        out, ref = _run(np.full(40, 7))
        np.testing.assert_array_equal(out, ref)

    def test_worst_case_window_boundary(self):
        """g0 lands at (q+1)*W - 1 exactly: Gaussians 0..126 own one slot
        each, Gaussian 127 owns two (slots 127-128), so the block starting
        at slot 128 needs candidates 127..254 + the offs of index 255 —
        the last lane of the second window, zero slack."""
        counts = np.ones(300, np.int64)
        counts[127] = 2
        out, ref = _run(counts)
        np.testing.assert_array_equal(out, ref)

    def test_single_giant_gaussian(self):
        out, ref = _run([1000, 1, 5])
        np.testing.assert_array_equal(out, ref)

    def test_capacity_truncates_mid_gaussian(self):
        counts = np.full(10, 40)  # total 400 > capacity 256
        out, ref = _run(counts, capacity=256)
        np.testing.assert_array_equal(out, ref)
        # slots past capacity's total clamp are invalid
        assert (out[10, 256:] == -1).all() if out.shape[1] > 256 else True

    def test_windowed_fallback_matches(self, monkeypatch):
        """Force the windowed (non-resident) kernel and pin its equality
        with the numpy reference on the worst-case boundary fixture."""
        monkeypatch.setattr(EXP, "RES_MAX_BYTES", 0)
        counts = np.ones(300, np.int64)
        counts[127] = 2
        out, ref = _run(counts)
        np.testing.assert_array_equal(out, ref)

    def test_zero_total(self):
        out = EXP.expand_rows(
            jnp.zeros((16, 2 * EXP.WCAND), jnp.float32),
            jnp.full((1, 2 * EXP.WCAND), EXP.HUGE, jnp.int32),
            jnp.zeros((EXP.ALIGN // EXP.BSLOT,), jnp.int32),
            jnp.asarray([0], jnp.int32), EXP.ALIGN, 8, sentinel=64,
            interpret=True,
        )
        out = np.asarray(out)
        assert (out[10] == -1).all()
        assert (out[11] == 64).all()
        assert (out[0:10] == 0).all()


class TestScanPallas:
    def test_cumsum_rows_matches_jnp(self):
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.ops import scan_pallas
        rng = np.random.default_rng(3)
        P = scan_pallas.BLK * 3
        mat = jnp.asarray(rng.normal(size=(16, P)).astype(np.float32))
        got = scan_pallas.cumsum_rows(mat, interpret=True)
        want = jnp.cumsum(mat, axis=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-4
        )

    def test_bwd_reduce_modes_agree(self, monkeypatch):
        """serial / batched / pallas backward reductions produce the same
        per-Gaussian gradients."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from gaussianprediction_tpu.data.synthetic import (
            orbit_camera, random_gaussians)
        from gaussianprediction_tpu.ops import instance_stream, projection

        g = random_gaussians(60, seed=5, scale_range=(-3.4, -2.2))
        cam = orbit_camera(0.4, width=64, height=48, uid=0).to_device_dict()
        proj = projection.project_from_params(
            jnp.asarray(g["xyz"]), jnp.exp(jnp.asarray(g["log_scales"])),
            jnp.asarray(g["rotation"]), cam, 64, 48,
        )
        rng = np.random.default_rng(1)
        feat0 = jnp.asarray(rng.normal(size=(60, 10)), jnp.float32)
        s0 = instance_stream.build_instances(
            feat0, proj.depth, proj.tiles_min, proj.tiles_max, proj.visible,
            4, 3, 2048, 64,
        )
        weights = jnp.asarray(
            rng.normal(size=(s0.inst.shape[1], 10)), jnp.float32
        )

        def f(feat):
            s = instance_stream.build_instances(
                feat, proj.depth, proj.tiles_min, proj.tiles_max,
                proj.visible, 4, 3, 2048, 64,
            )
            return jnp.sum(s.inst[:10] * weights.T)

        grads = {}
        for mode in ("serial", "batched", "pallas"):
            monkeypatch.setenv("GPT_BWD_REDUCE", mode)
            grads[mode] = np.asarray(jax.grad(f)(feat0))
        np.testing.assert_allclose(grads["batched"], grads["serial"],
                                   atol=1e-5)
        # blockwise association order differs from XLA's scan tree:
        # equal to f32 roundoff of the running sums, not bitwise
        np.testing.assert_allclose(grads["pallas"], grads["serial"],
                                   atol=2e-4)
