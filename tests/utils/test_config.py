"""Anchor INI config tests (reference: utils/config.py format)."""

import pytest

from tdnet.ops.anchors import anchors_for_shape
from tdnet.utils.config import parse_anchor_parameters, read_config_file


def test_parse_anchor_parameters(tmp_path):
    p = tmp_path / "anchors.ini"
    p.write_text(
        "[anchor_parameters]\n"
        "sizes   = 16 32 64 128 256\n"
        "strides = 8 16 32 64 128\n"
        "ratios  = 0.5 1 2 3\n"
        "scales  = 1 1.5\n"
    )
    params = parse_anchor_parameters(read_config_file(str(p)))
    assert params.sizes == (16, 32, 64, 128, 256)
    assert params.ratios == (0.5, 1.0, 2.0, 3.0)
    assert params.num_anchors == 8
    a = anchors_for_shape((64, 64), anchor_params=params)
    assert a.shape[0] == sum(
        (-(-64 // s)) ** 2 * 8 for s in [8, 16, 32, 64, 128]  # ceil division
    )


def test_partial_override_keeps_defaults(tmp_path):
    p = tmp_path / "anchors.ini"
    p.write_text("[anchor_parameters]\nratios = 1\n")
    params = parse_anchor_parameters(read_config_file(str(p)))
    assert params.ratios == (1.0,)
    assert params.sizes == (32, 64, 128, 256, 512)  # default


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        read_config_file("/nonexistent/anchors.ini")


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "anchors.ini"
    p.write_text("[anchor_parameters]\nsizez = 1 2 3\n")
    with pytest.raises(ValueError, match="unknown anchor_parameters keys"):
        read_config_file(str(p))


def test_mismatched_lengths_raise(tmp_path):
    p = tmp_path / "anchors.ini"
    p.write_text("[anchor_parameters]\nsizes = 32 64\nstrides = 8 16 32\n")
    with pytest.raises(ValueError, match="equal length"):
        parse_anchor_parameters(read_config_file(str(p)))
