"""Every shipped config composes and instantiates (VERDICT r2 item 6).

The reference ships 18 app compositions plus dataset/initialization/
paper groups (/root/reference/configs); this asserts the whole tree
resolves through the loader and that each app config maps onto a
TrainerConfig (the step beyond YAML: all keys the trainer consumes are
well-typed). App configs with user-mandatory ``???`` keys (cusfm fused
point cloud, checkpoint init) get placeholder overrides.
"""

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CONFIG_DIR = os.path.join(REPO, "configs")


def _all_configs(sub):
    pats = glob.glob(os.path.join(CONFIG_DIR, sub, "**", "*.yaml"),
                     recursive=True)
    return sorted(os.path.relpath(p, CONFIG_DIR)[:-len(".yaml")]
                  for p in pats)


APPS = _all_configs("apps")
PAPER = _all_configs("paper")

PLACEHOLDERS = [
    "path=/tmp/nonexistent_scene",
    "initialization.fused_point_cloud_path=/tmp/nonexistent.ply",
    "initialization.path=/tmp/nonexistent.npz",
]


class TestConfigTree:
    def test_reference_app_parity(self):
        """Every reference app config name exists here (modulo none)."""
        ref_apps = {os.path.basename(p)[:-len(".yaml")] for p in glob.glob(
            "/root/reference/configs/apps/*.yaml")}
        if not ref_apps:
            pytest.skip("reference tree unavailable")
        mine = {os.path.basename(a) for a in APPS}
        assert ref_apps <= mine, f"missing apps: {sorted(ref_apps - mine)}"

    def test_reference_group_parity(self):
        """dataset/initialization/paper group files all mirrored."""
        for group in ("dataset", "initialization", "paper/3dgrt",
                      "paper/3dgut"):
            ref = {os.path.basename(p) for p in glob.glob(
                f"/root/reference/configs/{group}/*.yaml")}
            if not ref:
                continue
            mine = {os.path.basename(p) for p in glob.glob(
                os.path.join(CONFIG_DIR, group, "*.yaml"))}
            assert ref <= mine, f"{group}: missing {sorted(ref - mine)}"

    @pytest.mark.parametrize("name", APPS + PAPER)
    def test_composes_and_instantiates(self, name):
        from threedgrut_tpu.config.loader import load_config, to_trainer_config

        conf = load_config(name, overrides=list(PLACEHOLDERS))
        assert conf.render.method in ("3dgrt", "3dgut")
        tconf = to_trainer_config(conf)
        assert tconf.n_iterations > 0
        assert tconf.raster.max_pairs % 128 == 0
        # strategy method resolves to a known implementation
        assert tconf.strategy in ("gs", "mcmc")

    @pytest.mark.parametrize("name", ["base", "base_gs", "base_mcmc"])
    def test_roots(self, name):
        from threedgrut_tpu.config.loader import load_config

        conf = load_config(name, overrides=list(PLACEHOLDERS))
        assert conf.n_iterations == 30000

    def test_mcmc_root_carries_paper_regularizers(self):
        from threedgrut_tpu.config.loader import load_config

        conf = load_config("base_mcmc", overrides=list(PLACEHOLDERS))
        assert conf.model.default_density == 0.5
        assert conf.loss.use_opacity and conf.loss.lambda_opacity == 0.01
        assert conf.loss.use_scale and conf.loss.lambda_scale == 0.01

    def test_ncore_dataset_keys(self):
        from threedgrut_tpu.config.loader import load_config

        conf = load_config("apps/ncore_3dgut", overrides=list(PLACEHOLDERS))
        assert conf.dataset.type == "ncore"
        assert conf.dataset.val_frame_interval == 8
        assert conf.initialization.method == "lidar"
