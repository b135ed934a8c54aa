"""Interval fold kernel (ops/pallas/fold.py) + grad_fold route parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.ops.pallas.fold import (BLKR, FSLAB,
                                            fold_sorted_intervals,
                                            fold_sorted_intervals_wide)
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut


class TestFoldKernel:
    def test_matches_segment_sum(self):
        rng = np.random.default_rng(0)
        p, r, fdim = 2 * FSLAB, 2 * BLKR, 16
        # random sorted disjoint contiguous intervals covering [0, p)
        cuts = np.sort(rng.choice(p, size=r - 1, replace=False))
        slot = np.concatenate([[0], cuts]).astype(np.int32)
        nxt = np.concatenate([cuts, [p]]).astype(np.int32)
        rank = np.repeat(np.arange(r), nxt - slot).astype(np.float32)
        pre = rng.normal(size=(p, fdim)).astype(np.float32)
        got = fold_sorted_intervals(jnp.asarray(pre), jnp.asarray(rank),
                                    jnp.asarray(slot), jnp.asarray(nxt),
                                    interpret=True)
        ref = jax.ops.segment_sum(jnp.asarray(pre),
                                  jnp.asarray(rank.astype(np.int32)),
                                  num_segments=r)
        # 1e-4: dot_f32's 2-pass split leaves a ~2^-18-relative residual
        # per folded value, accumulated over segment size
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_ragged_sizes_padded(self):
        rng = np.random.default_rng(1)
        p, r, fdim = 300, 70, 8   # neither FSLAB- nor BLKR-aligned
        sizes = rng.multinomial(p, np.ones(r) / r)
        nxt = np.cumsum(sizes).astype(np.int32)
        slot = (nxt - sizes).astype(np.int32)
        rank = np.repeat(np.arange(r), sizes).astype(np.float32)
        pre = rng.normal(size=(p, fdim)).astype(np.float32)
        got = fold_sorted_intervals(jnp.asarray(pre), jnp.asarray(rank),
                                    jnp.asarray(slot), jnp.asarray(nxt),
                                    interpret=True)
        ref = jax.ops.segment_sum(jnp.asarray(pre),
                                  jnp.asarray(rank.astype(np.int32)),
                                  num_segments=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFoldWideKernel:
    @pytest.mark.parametrize("fdim,r", [(16, 3 * 1024), (8, 2048),
                                        (64, 512), (12, 1024)])
    def test_matches_segment_sum(self, fdim, r):
        rng = np.random.default_rng(3)
        p = 2 * FSLAB
        cuts = np.sort(rng.choice(p, size=r - 1, replace=False))
        slot = np.concatenate([[0], cuts]).astype(np.int32)
        nxt = np.concatenate([cuts, [p]]).astype(np.int32)
        rank = np.repeat(np.arange(r), nxt - slot).astype(np.float32)
        pre = rng.normal(size=(p, fdim)).astype(np.float32)
        got = fold_sorted_intervals_wide(
            jnp.asarray(pre), jnp.asarray(rank), jnp.asarray(slot),
            jnp.asarray(nxt), interpret=True)
        ref = jax.ops.segment_sum(jnp.asarray(pre),
                                  jnp.asarray(rank.astype(np.int32)),
                                  num_segments=r)
        # 1e-4: dot_f32's 2-pass split leaves a ~2^-18-relative residual
        # per folded value, which accumulates over segment size
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_ragged_unaligned(self):
        rng = np.random.default_rng(4)
        p, r, fdim = 300, 70, 16   # neither FSLAB- nor superblock-aligned
        sizes = rng.multinomial(p, np.ones(r) / r)
        nxt = np.cumsum(sizes).astype(np.int32)
        slot = (nxt - sizes).astype(np.int32)
        rank = np.repeat(np.arange(r), sizes).astype(np.float32)
        pre = rng.normal(size=(p, fdim)).astype(np.float32)
        got = fold_sorted_intervals_wide(
            jnp.asarray(pre), jnp.asarray(rank), jnp.asarray(slot),
            jnp.asarray(nxt), interpret=True)
        ref = jax.ops.segment_sum(jnp.asarray(pre),
                                  jnp.asarray(rank.astype(np.int32)),
                                  num_segments=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_rows_upcast_accumulate(self):
        rng = np.random.default_rng(5)
        p, r, fdim = FSLAB, 256, 16
        sizes = rng.multinomial(p, np.ones(r) / r)
        nxt = np.cumsum(sizes).astype(np.int32)
        slot = (nxt - sizes).astype(np.int32)
        rank = np.repeat(np.arange(r), sizes).astype(np.float32)
        pre = rng.normal(size=(p, fdim)).astype(np.float32)
        pre_bf = jnp.asarray(pre).astype(jnp.bfloat16)
        got = fold_sorted_intervals_wide(
            pre_bf, jnp.asarray(rank), jnp.asarray(slot),
            jnp.asarray(nxt), interpret=True)
        assert got.dtype == jnp.float32
        ref = jax.ops.segment_sum(pre_bf.astype(jnp.float32),
                                  jnp.asarray(rank.astype(np.int32)),
                                  num_segments=r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestGradFoldRoute:
    @pytest.mark.slow
    def test_gradients_match_scatter_route(self):
        cam, model = make_test_scene(n=96, seed=2, res=(64, 48))
        target = jnp.zeros((48, 64, 3))
        ut = UTConfig()

        def loss(params, grad_fold):
            m = model.replace(params=params)
            rc = RasterConfig(max_pairs=1 << 14, grad_fold=grad_fold)
            out = render_gut(cam, ut, rc, m, sh_degree=2, interpret=True)
            return (jnp.mean(jnp.abs(out["pred_features"] - target))
                    + 0.1 * jnp.mean(out["pred_opacity"])
                    + 0.01 * jnp.mean(out["pred_dist"]))

        g_scatter = jax.grad(lambda p: loss(p, False))(model.params)
        g_fold = jax.grad(lambda p: loss(p, True))(model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo", "features_specular"]:
            a = np.asarray(getattr(g_fold, name))
            b = np.asarray(getattr(g_scatter, name))
            scale = np.abs(b).max() + 1e-10
            # 1e-4: fold and scatter accumulate in different orders and
            # the fold's dot_f32 drops 2-pass split tails
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-4,
                                       err_msg=f"grad mismatch: {name}")

    @pytest.mark.slow
    def test_wide_and_bf16_routes(self):
        """fold_wide is exact vs the narrow fold; grad_bf16 rounds the
        per-pair rows only (grad cosine > 0.9999 on every param)."""
        cam, model = make_test_scene(n=96, seed=2, res=(64, 48))
        target = jnp.zeros((48, 64, 3))
        ut = UTConfig()

        def loss(params, **kw):
            m = model.replace(params=params)
            rc = RasterConfig(max_pairs=1 << 14, grad_fold=True, **kw)
            out = render_gut(cam, ut, rc, m, sh_degree=2, interpret=True)
            return (jnp.mean(jnp.abs(out["pred_features"] - target))
                    + 0.1 * jnp.mean(out["pred_opacity"]))

        g_ref = jax.grad(lambda p: loss(p))(model.params)
        g_wide = jax.grad(lambda p: loss(p, fold_wide=True))(model.params)
        g_bf = jax.grad(lambda p: loss(p, fold_wide=True,
                                       grad_bf16=True))(model.params)
        for name in ["positions", "rotation", "scale", "density",
                     "features_albedo", "features_specular"]:
            a = np.asarray(getattr(g_wide, name))
            b = np.asarray(getattr(g_ref, name))
            scale = np.abs(b).max() + 1e-10
            # wide and narrow accumulate in different matmul orders ->
            # f32 noise only
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                       err_msg=f"wide mismatch: {name}")
            c = np.asarray(getattr(g_bf, name)).ravel()
            cos = float(np.dot(c, b.ravel())
                        / (np.linalg.norm(c) * np.linalg.norm(b.ravel())
                           + 1e-30))
            # 0.999 is the repo's kernel-change grad-cosine gate
            # (NOTES.md); measured 0.9991 worst (rotation) on this scene
            assert cos > 0.999, f"bf16 grad cosine {name}: {cos}"
