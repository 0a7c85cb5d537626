"""Config parsing: every shipped .ini parses with reference semantics."""

from pathlib import Path

import pytest

from geomapnet_tpu.cli.config import parse_ini

CONFIGS = sorted(Path("configs").glob("*.ini"))


def test_configs_present():
    names = {p.name for p in CONFIGS}
    # the reference's config set must ship (scripts/configs/*.ini)
    assert {"posenet.ini", "mapnet.ini", "mapnet++_7Scenes.ini",
            "mapnet++_RobotCar.ini", "pgo_inference_7Scenes.ini",
            "pgo_inference_RobotCar.ini"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=[p.name for p in CONFIGS])
def test_every_config_parses(path):
    cfg = parse_ini(path)
    assert cfg.n_epochs > 0
    assert cfg.batch_size > 0
    assert cfg.opt in ("adam", "sgd", "rmsprop")
    assert 0.0 <= cfg.dropout <= 1.0


def test_mapnet_reference_values():
    cfg = parse_ini("configs/mapnet.ini")
    assert cfg.n_epochs == 300 and cfg.batch_size == 20
    assert cfg.lr == pytest.approx(1e-4)
    assert cfg.weight_decay == pytest.approx(5e-4)
    assert cfg.beta == -3.0 and cfg.gamma == -3.0
    assert cfg.steps == 3 and cfg.skip == 10
    assert cfg.color_jitter == pytest.approx(0.7)
    assert cfg.variable_skip is False and cfg.real is False


def test_mapnetpp_finetune_values():
    cfg = parse_ini("configs/mapnet++_7Scenes.ini")
    assert cfg.n_epochs == 5  # fine-tune schedule (README.md:198-210)
    assert cfg.vo_lib in ("dso", "orbslam", "gps", "stereo")


def test_pgo_covariances():
    cfg = parse_ini("configs/pgo_inference_7Scenes.ini")
    assert cfg.s_abs_trans > 0 and cfg.s_rel_trans > 0
