"""Config system: the reference's shipped YAMLs must load unmodified."""

import math

import pytest

from ssd3d.config import get_default_cfg, load_cfg


REF_3DSSD_YAML = "/root/reference/configs/kitti/3dssd/3dssd.yaml"
REF_PRCNN_S1 = "/root/reference/configs/kitti/pointrcnn/tiny_pointrcnn_stage1.yaml"
REF_PRCNN_S2 = "/root/reference/configs/kitti/pointrcnn/tiny_pointrcnn_stage2.yaml"


def test_defaults():
    cfg = get_default_cfg()
    assert cfg.MODEL.ANGLE_CLS_NUM == 12
    assert cfg.DATASET.TYPE == "KITTI"
    assert cfg.MODEL.FIRST_STAGE.REGRESSION_METHOD.TYPE == "Dist-Anchor"


def test_load_reference_3dssd_yaml():
    cfg = load_cfg(REF_3DSSD_YAML)
    assert cfg.DATASET.KITTI.CLS_LIST == ("Car",)
    assert cfg.MODEL.POINTS_NUM_FOR_TRAINING == 16384
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    assert len(arch) == 6
    assert arch[0][7] == ["D-FPS"] and arch[0][8] == [4096]
    assert arch[1][7] == ["FS"] and arch[1][8] == [512]
    assert arch[4][11] == "Vote_Layer"
    assert arch[5][14] == 5  # CG layer groups around the vote centers
    assert cfg.MODEL.FIRST_STAGE.REGRESSION_METHOD.TYPE == "Dist-Anchor-free"
    assert cfg.MODEL.FIRST_STAGE.CLASSIFICATION_LOSS.TYPE == "Center-ness"
    assert cfg.MODEL.FIRST_STAGE.NMS_THRESH == pytest.approx(0.1)
    assert cfg.SOLVER.TYPE == "Adam"
    assert cfg.SOLVER.STEPS == [64560]
    assert cfg.DATASET.POINT_CLOUD_RANGE == (-40, 40, -5, 3, 0, 70)
    assert cfg.TRAIN.AUGMENTATIONS.MIXUP.OPEN is True


def test_load_reference_pointrcnn_yamls():
    cfg = load_cfg(REF_PRCNN_S1)
    assert cfg.MODEL.FIRST_STAGE.REGRESSION_METHOD.TYPE in (
        "Bin-Anchor", "Log-Anchor",
    )
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    assert any(layer[11] == "FP_Layer" for layer in arch)
    cfg2 = load_cfg(REF_PRCNN_S2)
    assert cfg2.MODEL.TYPE == "DoubleStage"


def test_cli_override():
    cfg = load_cfg(REF_3DSSD_YAML, ["SOLVER.BASE_LR", "0.004", "TRAIN.CONFIG.BATCH_SIZE", "8"])
    assert cfg.SOLVER.BASE_LR == pytest.approx(0.004)
    assert cfg.TRAIN.CONFIG.BATCH_SIZE == 8


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
    with pytest.raises(KeyError):
        load_cfg(str(p))


def test_freeze():
    cfg = get_default_cfg().freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.TYPE = "x"
