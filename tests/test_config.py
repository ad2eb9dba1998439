"""Config composition + typed schema tests."""

import pytest

from pixel_heal_thyself_tpu.config import Config, ConfigRegistry, compose
from pixel_heal_thyself_tpu.config.run_dirs import register_run_dirs_resolver
from pixel_heal_thyself_tpu.ops.curves import CurveOrder

register_run_dirs_resolver()


def _compose(name, overrides=None):
    # unresolved tree: no run-dir side effects
    return compose(name, overrides, resolve_interpolations=False)


class TestCompose:
    def test_default_tree(self):
        cfg = _compose("default")
        assert cfg["seed"] == 990819
        assert cfg["data_ratio"] == 0.95
        assert cfg["model"]["name"] == "afgsa"
        assert cfg["model"]["afgsa"]["self_attention"]["block_size"] == 8
        assert cfg["model"]["losses"]["gan_loss_w"] == 0.005
        assert cfg["data"]["patches"]["patch_size"] == 128
        assert cfg["trainer"]["batch_size"] == 8

    @pytest.mark.parametrize(
        "name,patch,npatch,batch",
        [("ci", 32, 100, 2), ("dev", 32, 100, 8), ("stag", 64, 200, 8), ("prod", 128, 400, 8)],
    )
    def test_env_configs(self, name, patch, npatch, batch):
        cfg = _compose(name)
        assert cfg["data"]["patches"]["patch_size"] == patch
        assert cfg["data"]["patches"]["num_patches"] == npatch
        assert cfg["trainer"]["batch_size"] == batch

    def test_ci_dotted_images_dir_nests(self):
        # the reference's OmegaConf left "images.dir" as a flat literal key;
        # our loader nests it so CI actually points at data/images_ci
        cfg = _compose("ci")
        assert cfg["data"]["images"]["dir"].endswith("/data/images_ci")
        assert "images.dir" not in cfg["data"]

    def test_overrides(self):
        cfg = _compose("ci", ["trainer.epochs=5", "model.curve_order=hilbert", "seed=1"])
        assert cfg["trainer"]["epochs"] == 5
        assert cfg["model"]["curve_order"] == "hilbert"
        assert cfg["seed"] == 1

    def test_mamba_model_select(self):
        cfg = _compose("default", ["model=mamba"])
        # group overrides via model=NAME
        assert cfg["model"]["name"] == "mamba"

    def test_interpolation(self, tmp_cwd):
        cfg = compose("ci", ["run_num=0"])
        assert cfg["_base_pattern"] == "p32_n100_r1.0"
        assert cfg["data"]["patches"]["dir"].endswith(
            "/data/images_ci/patches_p32_n100_r1.0",
        )
        assert cfg["paths"]["output_dir"] == "outputs/runs/afgsa_p32_n100_r1.0/run000"


class TestTypedConfig:
    def test_build_afgsa(self, tmp_cwd):
        cfg = Config.from_tree(compose("ci", ["run_num=0"]))
        assert cfg.model.name == "afgsa"
        assert cfg.model.self_attention.halo_size == 3
        assert cfg.model.curve_order is CurveOrder.RASTER
        assert cfg.model.losses.gp_loss_w == 10.0
        assert cfg.model.feature_map_channels == 256  # model-level key binds
        assert cfg.trainer.batch_size == 2
        assert cfg.trainer.model_path == ""
        assert cfg.data.patches.patch_size == 32
        ConfigRegistry.validate_config(cfg)

    def test_build_mamba(self, tmp_cwd):
        cfg = Config.from_tree(compose("default", ["model=mamba", "run_num=0"]))
        assert cfg.model.name == "mamba"
        assert cfg.model.d_state == 64
        assert cfg.model.d_conv == 4
        assert cfg.model.expansion == 4
        ConfigRegistry.validate_config(cfg)

    def test_curve_order_override(self, tmp_cwd):
        cfg = Config.from_tree(
            compose("ci", ["model.curve_order=zorder", "run_num=0"]),
        )
        assert cfg.model.curve_order is CurveOrder.ZORDER

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown config key"):
            Config.from_tree({"trainer": {"nope": 1}})


def test_model_config_overrides_reach_dataclass(tmp_cwd):
    cfg = Config.from_tree(
        compose(
            "ci",
            [
                "model.afgsa.self_attention.num_heads=8",
                "model.losses.use_ssim_loss=true",
                "run_num=0",
            ],
        ),
    )
    assert cfg.model.self_attention.num_heads == 8
    assert cfg.model.losses.use_ssim_loss is True
