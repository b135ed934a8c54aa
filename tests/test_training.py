"""End-to-end training slice: synthetic views, loss must decrease."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_utils import make_test_scene
from threedgrut_tpu.models.background import BackgroundConfig
from threedgrut_tpu.models.gaussians import (GaussianModelConfig,
                                             initialize_from_points)
from threedgrut_tpu.ops.ut import UTConfig
from threedgrut_tpu.render.common import RasterConfig
from threedgrut_tpu.render.gut import render_gut
from threedgrut_tpu.render.oracle import render_oracle
from threedgrut_tpu.data.protocols import Batch
from threedgrut_tpu.train.trainer import (LossConfig, OptimizerConfig,
                                          Trainer, TrainerConfig,
                                          camera_from_batch)

RES = (48, 32)


class SyntheticDataset:
    """Renders ground truth from a hidden 'true' scene via the oracle."""

    def __init__(self, n_views=6, seed=0):
        cam0, self.gt_model = make_test_scene(n=64, seed=seed, res=RES)
        self.batches = []
        rng = np.random.default_rng(seed)
        ut, rc = UTConfig(), RasterConfig(max_pairs=1 << 13)
        for v in range(n_views):
            # jitter the camera: small translation
            t = np.zeros(3, np.float32)
            t[:2] = rng.uniform(-0.3, 0.3, 2)
            cam = cam0.replace(t_start=jnp.asarray(t), t_end=jnp.asarray(t))
            out = render_oracle(cam, ut, rc, self.gt_model, sh_degree=2)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 3] = -t  # world-from-camera for identity rotation
            w, h = RES
            self.batches.append(Batch(
                rays_ori=np.zeros((h, w, 3), np.float32),
                rays_dir=np.zeros((h, w, 3), np.float32),
                T_to_world=c2w,
                rgb_gt=np.asarray(jnp.clip(out["pred_features"], 0, 1)),
                intrinsics=[0.9 * w, 0.9 * w, w / 2, h / 2],
                frame_idx=v))

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, i):
        return self.batches[i]

    def get_scene_extent(self):
        return 3.0

    def get_poses(self):
        return np.stack([b.T_to_world for b in self.batches])

    def get_observer_points(self):
        return np.zeros((len(self.batches), 3), np.float32)


def make_trainer(strategy="gs", **conf_kw):
    ds = SyntheticDataset()
    cfg = GaussianModelConfig(max_sh_degree=2)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.2, 1.2, (96, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(3.0, 5.5, 96)
    model = initialize_from_points(cfg, pts, capacity=256)
    conf_kw.setdefault("raster", RasterConfig(max_pairs=1 << 13))
    conf = TrainerConfig(
        strategy=strategy,
        init_n_features=0, max_n_features=2, increase_frequency=10,
        **conf_kw)
    conf.gs = conf.gs.replace(densify_start=5, densify_frequency=8,
                              densify_end=100, prune_start=5,
                              prune_frequency=8, prune_end=100,
                              reset_density_frequency=0)
    conf.mcmc = conf.mcmc.replace(relocate_start=5, relocate_frequency=8,
                                  add_start=5, add_frequency=8,
                                  max_n_gaussians=200)
    return Trainer(conf, ds, model)


class TestTraining:
    @pytest.mark.parametrize("strategy", ["gs", "mcmc"])
    @pytest.mark.slow
    def test_loss_decreases(self, strategy):
        tr = make_trainer(strategy)
        losses = []
        for step in range(30):
            batch = tr.dataset[step % len(tr.dataset)]
            m = tr.train_iteration(batch)
            losses.append(m["total"])
            assert np.isfinite(m["total"]), f"step {step} loss not finite"
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
        assert int(tr.model.n_active) > 0

    @pytest.mark.slow
    def test_selective_adam_runs(self):
        tr = make_trainer("gs", optimizer=OptimizerConfig(
            type="selective_adam"))
        for step in range(4):
            m = tr.train_iteration(tr.dataset[step % len(tr.dataset)])
            assert np.isfinite(m["total"])

    @pytest.mark.slow
    def test_checkpoint_roundtrip(self, tmp_path):
        tr = make_trainer("gs")
        for step in range(6):
            tr.train_iteration(tr.dataset[step % len(tr.dataset)])
        path = str(tmp_path / "ckpt.npz")
        tr.save_checkpoint(path)
        loss_ref = tr.train_iteration(tr.dataset[0])

        tr2 = make_trainer("gs")
        tr2.load_checkpoint(path)
        assert tr2.global_step == 6
        loss_2 = tr2.train_iteration(tr2.dataset[0])
        # same state -> near-identical next step (rng keys differ slightly
        # via trainer key stream; background is black so key is unused)
        np.testing.assert_allclose(loss_2["total"], loss_ref["total"],
                                   rtol=1e-4)

    def test_pair_budget_autocalibration(self):
        tr = make_trainer("gs", auto_max_pairs=True,
                          max_pairs_calibrate_every=100)
        base = tr._max_pairs
        # overflow at a calibration step -> budget grows to peak*headroom
        tr.global_step = 2
        tr._calibrate_pairs({"pairs": base, "overflow": 5000})
        assert tr._max_pairs >= base + 5000
        assert tr._max_pairs % 8192 == 0
        grown = tr._max_pairs
        # steady state without overflow: unchanged off-milestone
        tr.global_step = 3
        tr._calibrate_pairs({"pairs": 100, "overflow": 0})
        assert tr._max_pairs == grown
        # milestone with >2x headroom -> shrink (peak decays across
        # milestones so earlier spikes age out)
        tr._peak_pairs = 100
        tr.global_step = 100
        tr._calibrate_pairs({"pairs": 100, "overflow": 0})
        assert tr._max_pairs < grown
        assert tr._max_pairs >= 8192

    def test_checkpoint_embeds_config(self, tmp_path):
        import json

        from threedgrut_tpu.config.loader import config_from_dict

        tr = make_trainer("gs")
        tr.raw_conf = {"n_iterations": 42, "render": {"method": "3dgut"},
                       "path": "x"}
        path = str(tmp_path / "ckpt.npz")
        tr.save_checkpoint(path)
        data = np.load(path)
        assert "config_json" in data.files
        emb = json.loads(str(data["config_json"]))
        conf = config_from_dict(emb, overrides=["path=/other",
                                                "n_iterations=7"])
        assert conf.n_iterations == 7
        assert conf.path == "/other"
        assert conf.render.method == "3dgut"


class TestPPISP:
    @pytest.mark.slow
    def test_ppisp_trains_and_distills(self, tmp_path):
        tr = make_trainer("gs", post_processing="ppisp",
                          ppisp_n_distillation_steps=50)
        assert tr.ppisp_params is not None
        exp0 = np.asarray(tr.ppisp_params["exposure"]).copy()
        for step in range(8):
            m = tr.train_iteration(tr.dataset[step % len(tr.dataset)],
                                   frame_idx=step % len(tr.dataset))
            assert np.isfinite(m["total"])
        # per-frame exposure received gradient updates
        exp1 = np.asarray(tr.ppisp_params["exposure"])
        assert np.abs(exp1 - exp0).max() > 0

        # checkpoint roundtrip includes the ISP group
        path = str(tmp_path / "ckpt.npz")
        tr.save_checkpoint(path)
        tr2 = make_trainer("gs", post_processing="ppisp")
        tr2.load_checkpoint(path)
        np.testing.assert_allclose(
            np.asarray(tr2.ppisp_params["exposure"]), exp1, atol=1e-7)

        # controller distillation converges toward the frame parameters
        loss = tr.distill_ppisp_controller(steps=200)
        assert loss is not None and np.isfinite(loss)
        assert tr.ppisp_controller is not None

        # validation applies the controller path without error
        res = tr.validate()
        assert np.isfinite(res["psnr"])


class TestGroupedDispatch:
    """Fused multi-step dispatch (train_group) vs per-step train_iteration.

    With a deterministic background the two paths must be numerically
    identical: same frame order, same LR schedule, same strategy hooks at
    the same steps.
    """

    @pytest.mark.slow
    def test_group_matches_single_steps(self):
        # no strategy events inside the window: the only per-step
        # randomness (densify sampling) is off, so grouped and per-step
        # paths must agree numerically
        def quiet(tr):
            tr.conf.gs = tr.conf.gs.replace(densify_start=500,
                                            prune_start=500)
            return tr

        tr_a = quiet(make_trainer("gs"))
        tr_b = quiet(make_trainer("gs"))
        n = 12
        tr_a.run_training(max_steps=n, group_steps=False)
        tr_b.run_training(max_steps=n, group_steps=True)
        assert tr_a.global_step == tr_b.global_step == n
        pa, pb = tr_a._params_dict(), tr_b._params_dict()
        for k in pa:
            # scan vs per-dispatch compilation reassociates float ops;
            # tolerate small drift after 12 adam steps
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pb[k]),
                                       rtol=1e-3, atol=1e-4, err_msg=k)
        np.testing.assert_allclose(
            np.asarray(tr_a.gs_buffers.grad_norm_accum),
            np.asarray(tr_b.gs_buffers.grad_norm_accum),
            rtol=1e-3, atol=1e-4)
        assert int(tr_a.model.n_active) == int(tr_b.model.n_active)

    def test_group_respects_host_events(self):
        tr = make_trainer("gs")
        # densify/prune fire at steps 8, 16 (start=5, freq=8) -> groups
        # must break there
        ks = []
        s = tr.global_step
        while s < 20:
            k = tr._plan_group(20, 100, log_every=0)
            ks.append(k)
            s += k
            tr.global_step = s
        tr.global_step = 0
        boundaries = np.cumsum(ks)
        for event in (8, 16):
            assert event in boundaries, (ks, boundaries)

    @pytest.mark.slow
    def test_group_mcmc_runs(self):
        tr = make_trainer("mcmc")
        tr.run_training(max_steps=10, group_steps=True)
        m = tr.validate()
        assert np.isfinite(m["psnr"])

    @pytest.mark.slow
    def test_fused_events_match_host_path(self):
        """Strategy events fused as the group program's static suffix
        (trainer._build_train_group end_events) must be numerically
        identical to the host-sequenced _post_optimizer_step path.

        Split sampling is the only rng consumer inside GS events; with
        split disabled (threshold inf) clone/prune/reset are all
        deterministic, so grouped-with-fused-events and per-step paths
        must agree to float tolerance."""
        def cfg(tr):
            tr.conf.gs = tr.conf.gs.replace(
                split_grad_threshold=1e9,
                clone_grad_threshold=1e-8,   # guarantee clones fire
                # nothing classifies as "big": all qualifying particles
                # take the (deterministic) clone branch, never split
                relative_size_threshold=1e3,
                reset_density_frequency=16,
                reset_density_start=0, reset_density_end=100)
            return tr

        tr_a = cfg(make_trainer("gs"))
        tr_b = cfg(make_trainer("gs"))
        n = 20  # covers densify+prune at 8, 16 and reset at 16
        tr_a.run_training(max_steps=n, group_steps=False)
        tr_b.run_training(max_steps=n, group_steps=True)
        # the grouped path must actually have fused events in-program
        fused = [k for k in tr_b._train_step_cache
                 if isinstance(k, tuple) and k[0] == "group" and k[5]]
        assert fused, "no group program carried end_events"
        assert int(tr_a.model.n_active) == int(tr_b.model.n_active)
        assert int(tr_a.model.n_active) > 96  # clones actually happened
        pa, pb = tr_a._params_dict(), tr_b._params_dict()
        na = int(tr_a.model.n_active)
        for k in pa:
            a, b = np.asarray(pa[k]), np.asarray(pb[k])
            np.testing.assert_allclose(a[:na], b[:na], rtol=1e-3,
                                       atol=1e-4, err_msg=k)
        np.testing.assert_allclose(
            np.asarray(tr_a.gs_buffers.grad_norm_accum),
            np.asarray(tr_b.gs_buffers.grad_norm_accum),
            rtol=1e-3, atol=1e-4)


class Test3DGRTAppConfig:
    """The 3dgrt app YAML must reach the kernel with 3DGRT semantics
    (VERDICT: trainer bypasses render_grt's defaults, so the config
    must pin them; reference configs/base_3dgrt.yaml kernel degree 4,
    min_transmittance 1e-3, sorted compositing)."""

    def _tconf(self):
        from threedgrut_tpu.config.loader import load_config, to_trainer_config
        conf = load_config("apps/nerf_synthetic_3dgrt",
                           overrides=["path=/nonexistent"])
        return to_trainer_config(conf)

    def test_render_config_pins_3dgrt_semantics(self):
        t = self._tconf()
        assert t.raster.kernel_degree == 4
        assert t.raster.sorted_compositing is True
        assert abs(t.raster.min_transmittance - 1e-3) < 1e-9
        assert t.ut.alpha_threshold == pytest.approx(1.0 / 255.0)

    @pytest.mark.slow
    def test_trainer_runs_sorted_kernel(self):
        t = self._tconf()
        tr = make_trainer("gs", raster=t.raster.replace(
            max_pairs=1 << 13, sort_window=32))
        assert tr.conf.raster.sorted_compositing
        for step in range(2):
            m = tr.train_iteration(tr.dataset[step])
            assert np.isfinite(m["total"])


class TestFusedPerturb:
    @pytest.mark.slow
    def test_mcmc_groups_fuse_and_perturb(self):
        """Per-step MCMC perturb rides inside the group scan: groups are
        >1 step inside the perturb window, and positions receive noise
        beyond the optimizer step."""
        tr = make_trainer("mcmc")
        c = tr.conf.mcmc
        assert c.perturb_frequency == 1
        # planner must fuse despite the every-step perturb
        tr.global_step = 20  # inside perturb window, between events
        k = tr._plan_group(100, 50, log_every=0)
        assert k > 1, "per-step perturb must not break group fusion"
        tr.global_step = 0

        # count perturb invocations traced into the group program: one
        # per fused step (the host hook must be skipped for the group)
        import threedgrut_tpu.strategy.mcmc as mcmc_mod
        import threedgrut_tpu.train.trainer as trainer_mod
        calls = {"n": 0}
        orig_perturb = mcmc_mod.perturb

        def counting_perturb(*a, **kw):
            calls["n"] += 1
            return orig_perturb(*a, **kw)

        trainer_mod.mcmc_strategy.perturb = counting_perturb
        try:
            tr.train_group(None if tr._gt_cache() is not False else
                           [tr.dataset[i] for i in range(4)],
                           [0, 1, 2, 3])
        finally:
            trainer_mod.mcmc_strategy.perturb = orig_perturb
        # traced exactly once inside the scan body (per-step via scan),
        # and NOT called by the host hook afterwards
        assert calls["n"] == 1, calls
        p1 = np.asarray(tr.model.params.positions)
        assert np.isfinite(p1).all()
