"""Headless tests for GUI pure logic (widgets that need a display are
exercised manually; their array/parameter logic is factored into pure
functions tested here)."""

import numpy as np
from PIL import Image

from dither_pie_tpu.gui.widgets import clamp_parameters, sample_grid_from_image


PARAM_INFO = {
    "size": {"type": "int", "default": 64, "min": 32, "max": 128},
    "gamma": {"type": "float", "default": 1.5, "min": 0.5, "max": 3.0},
    "variant": {"type": "choice", "default": "atkinson",
                "choices": ["atkinson", "stucki"]},
}


def test_clamp_parameters_ranges():
    out = clamp_parameters(PARAM_INFO, {"size": "500", "gamma": "0.1",
                                        "variant": "stucki"})
    assert out == {"size": 128, "gamma": 0.5, "variant": "stucki"}


def test_clamp_parameters_invalid_fall_back():
    out = clamp_parameters(PARAM_INFO, {"size": "abc", "gamma": None,
                                        "variant": "nope"})
    assert out == {"size": 64, "gamma": 1.5, "variant": "atkinson"}


def test_clamp_parameters_missing_use_defaults():
    out = clamp_parameters(PARAM_INFO, {})
    assert out == {"size": 64, "gamma": 1.5, "variant": "atkinson"}


def test_sample_grid_from_image():
    arr = np.zeros((64, 96, 3), np.uint8)
    arr[:, 48:] = 255
    grid = sample_grid_from_image(Image.fromarray(arr), 16)
    # 64x96 -> smaller side 16, even dims -> (16, 24)
    assert grid.shape == (16, 24, 3)
    assert np.all(grid[:, : grid.shape[1] // 2] == 0)
    assert np.all(grid[:, grid.shape[1] // 2:] == 255)


def test_sample_grid_with_geometry_identity():
    """Scale 1 / offset 0 must equal the plain cell-center sampler."""
    from dither_pie_tpu.gui.widgets import sample_grid_with_geometry

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (64, 96, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    base = sample_grid_from_image(img, 16)
    th, tw = base.shape[:2]
    geo = sample_grid_with_geometry(img, (tw, th), (96 / tw, 64 / th))
    np.testing.assert_array_equal(base, geo)


def test_sample_grid_with_geometry_offset_and_clamp():
    from dither_pie_tpu.gui.widgets import sample_grid_with_geometry

    arr = np.zeros((32, 32, 3), np.uint8)
    arr[:, 16:] = 255
    img = Image.fromarray(arr)
    # Offset the grid right by half the image: all sampled centers >= 16.
    g = sample_grid_with_geometry(img, (8, 8), (4.0, 4.0),
                                  grid_offset=(16.0, 0.0))
    assert np.all(g == 255)
    # Large negative offset clamps to the left border (black).
    g = sample_grid_with_geometry(img, (8, 8), (4.0, 4.0),
                                  grid_offset=(-100.0, 0.0))
    assert np.all(g == 0)


def test_config_manager_set_both_forms(tmp_path):
    from dither_pie_tpu.api.config_manager import ConfigManager

    cfg = ConfigManager(str(tmp_path / "c.json"))
    cfg.set("pixelization_editor", "dialog_width", value=801)  # reference form
    cfg.set("pixelization_editor", "dialog_height", 601)       # positional
    assert cfg.get("pixelization_editor", "dialog_width") == 801
    assert cfg.get("pixelization_editor", "dialog_height") == 601


def test_gui_modules_import():
    import dither_pie_tpu.gui.app  # noqa: F401
    import dither_pie_tpu.gui.widgets  # noqa: F401
