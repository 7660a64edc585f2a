"""Support utilities: palette file I/O, hex conversion, lospec import,
dimension math, file validation (reference surface: /root/reference/utils.py).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from PIL import Image

from dither_pie_tpu.core.colors import hex_to_rgb, rgb_to_hex

__all__ = [
    "load_palettes_from_file",
    "save_palettes_to_file",
    "hex_to_rgb",
    "rgb_to_hex",
    "palette_from_hex_list",
    "import_lospec_palette",
    "compute_even_dimensions",
    "estimate_video_memory_usage",
    "validate_video_file",
    "validate_image_file",
    "get_image_info",
    "ensure_rgb",
    "default_palette_file",
    "PaletteManager",
]

_BUILTIN_SENTINEL = "<builtin>"


def default_palette_file() -> str:
    """User palette.json in cwd if present, else the bundled builtin set."""
    if os.path.exists("palette.json"):
        return "palette.json"
    return _BUILTIN_SENTINEL


def load_palettes_from_file(filepath: Optional[str] = None) -> List[Dict]:
    filepath = filepath or default_palette_file()
    if filepath == _BUILTIN_SENTINEL:
        from dither_pie_tpu.core.builtin_palettes import builtin_palette_list

        return builtin_palette_list()
    if not os.path.exists(filepath):
        return []
    try:
        with open(filepath, "r", encoding="utf-8") as f:
            palettes = json.load(f)
        return palettes if isinstance(palettes, list) else []
    except Exception as e:
        print(f"Error loading palettes: {e}")
        return []


def save_palettes_to_file(palettes: List[Dict], filepath: str = "palette.json"):
    try:
        with open(filepath, "w", encoding="utf-8") as f:
            json.dump(palettes, f, indent=4)
    except Exception as e:
        print(f"Error saving palettes: {e}")


def palette_from_hex_list(hex_list: List[str]) -> List[Tuple[int, int, int]]:
    return [hex_to_rgb(h) for h in hex_list]


def import_lospec_palette(url: str) -> Optional[Dict]:
    """Import a palette from a lospec.com URL (requires network access)."""
    try:
        import requests

        slug = url.rstrip("/").split("/")[-1]
        api_url = f"https://lospec.com/palette-list/{slug}.json"
        response = requests.get(api_url, timeout=10)
        response.raise_for_status()
        data = response.json()
        colors = [hex_to_rgb(f"#{c}") for c in data.get("colors", [])]
        if not colors:
            return None
        return {"name": data.get("name", slug),
                "colors": [rgb_to_hex(c) for c in colors]}
    except Exception as e:
        print(f"Error importing from Lospec: {e}")
        return None


def compute_even_dimensions(orig_w: int, orig_h: int, max_size: int) -> Tuple[int, int]:
    """Target dims: smaller side ~= max_size, both even (libx264/yuv420p)."""
    if orig_w >= orig_h:
        target_h = max_size if max_size % 2 == 0 else max_size - 1
        target_w = int(round((orig_w / orig_h) * target_h))
        if target_w % 2 != 0:
            target_w += 1
    else:
        target_w = max_size if max_size % 2 == 0 else max_size - 1
        target_h = int(round((orig_h / orig_w) * target_w))
        if target_h % 2 != 0:
            target_h += 1
    return target_w, target_h


def estimate_video_memory_usage(width: int, height: int, frame_count: int) -> float:
    """Rough MB estimate: 3 B/px RGB x1.5 overhead."""
    bytes_per_frame = width * height * 3 * 1.5
    return (bytes_per_frame * frame_count) / (1024 * 1024)


VIDEO_EXTENSIONS = {".mp4", ".avi", ".mov", ".mkv", ".wmv", ".flv", ".webm", ".m4v"}
IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".gif", ".bmp", ".tiff", ".webp"}


def validate_video_file(filepath: str) -> bool:
    ext = os.path.splitext(filepath)[1].lower()
    return ext in VIDEO_EXTENSIONS and os.path.exists(filepath)


def validate_image_file(filepath: str) -> bool:
    ext = os.path.splitext(filepath)[1].lower()
    return ext in IMAGE_EXTENSIONS and os.path.exists(filepath)


def get_image_info(filepath: str) -> Optional[Dict]:
    try:
        with Image.open(filepath) as img:
            return {"width": img.width, "height": img.height,
                    "mode": img.mode, "format": img.format}
    except Exception as e:
        print(f"Error getting image info: {e}")
        return None


def ensure_rgb(image: Image.Image) -> Image.Image:
    if image.mode != "RGB":
        return image.convert("RGB")
    return image


class PaletteManager:
    """CRUD over a palette.json file (list of {name, colors:[#hex]})."""

    def __init__(self, filepath: Optional[str] = None):
        self.filepath = filepath or default_palette_file()
        self.palettes: List[Dict] = []
        self.load()

    @staticmethod
    def _hex_to_rgb(hex_color: str) -> Tuple[int, int, int]:
        return hex_to_rgb(hex_color)

    def load(self):
        self.palettes = load_palettes_from_file(self.filepath)

    def save(self):
        # Never write back into the bundled data; redirect user edits to a
        # local palette.json.
        target = self.filepath
        if target == _BUILTIN_SENTINEL:
            target = "palette.json"
            self.filepath = target
        save_palettes_to_file(self.palettes, target)

    def add_palette(self, name: str, colors: List[str]):
        for pal in self.palettes:
            if pal["name"] == name:
                pal["colors"] = colors
                self.save()
                return
        self.palettes.append({"name": name, "colors": colors})
        self.save()

    def remove_palette(self, name: str):
        self.palettes = [p for p in self.palettes if p["name"] != name]
        self.save()

    def get_palette(self, name: str) -> Optional[Dict]:
        for pal in self.palettes:
            if pal["name"] == name:
                return pal
        return None

    def get_palette_colors_rgb(self, name: str) -> Optional[List[Tuple[int, int, int]]]:
        pal = self.get_palette(name)
        if pal:
            return palette_from_hex_list(pal["colors"])
        return None

    def list_palette_names(self) -> List[str]:
        return [p["name"] for p in self.palettes]
