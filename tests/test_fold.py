"""Interval fold kernel (ops/pallas/fold.py) + grad_fold route parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.ops.pallas.fold import BLKR, FSLAB, fold_sorted_intervals
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
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

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
            np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                       err_msg=f"grad mismatch: {name}")
