"""Segmented checkpoint/resume for long video jobs.

The reference processes videos start-to-finish in a tempdir with no resume
(SURVEY.md §5). Here a job can run in fixed-size segments: each segment is
encoded to ``<output>.segNNNN.mp4`` and recorded in a ``.resume.json``
manifest; an interrupted job restarted with ``resume=True`` re-processes
only the missing segments, then the parts are concatenated (stream copy)
and the original audio/subtitles mapped in.

Segment planning is pure (unit-tested); the encode/concat legs need ffmpeg.
"""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple


def manifest_path(output_path: str) -> str:
    return output_path + ".resume.json"


def segment_part_path(output_path: str, seg_idx: int) -> str:
    return f"{output_path}.seg{seg_idx:04d}.mp4"


def plan_segments(total_frames: int, segment_size: int,
                  completed: Set[int]) -> List[Tuple[int, int, int]]:
    """[(seg_idx, start_frame, end_frame)] for segments still to process."""
    if segment_size <= 0:
        raise ValueError("segment_size must be positive")
    out = []
    seg = 0
    start = 0
    while start < total_frames:
        end = min(start + segment_size, total_frames)
        if seg not in completed:
            out.append((seg, start, end))
        seg += 1
        start = end
    return out


def n_segments(total_frames: int, segment_size: int) -> int:
    return (total_frames + segment_size - 1) // segment_size


def load_manifest(output_path: str, expect: Dict) -> Set[int]:
    """Completed segment indices, if the manifest matches this job's
    parameters (otherwise start fresh)."""
    p = manifest_path(output_path)
    if not os.path.exists(p):
        return set()
    try:
        data = json.loads(Path(p).read_text())
    except Exception:
        return set()
    for k, v in expect.items():
        if data.get(k) != v:
            return set()
    done = set(int(i) for i in data.get("completed", []))
    # Only trust segments whose part files still exist.
    return {i for i in done if os.path.exists(segment_part_path(output_path, i))}


def save_manifest(output_path: str, expect: Dict, completed: Set[int]):
    data = dict(expect)
    data["completed"] = sorted(completed)
    Path(manifest_path(output_path)).write_text(json.dumps(data, indent=2))


def concat_segments(output_path: str, total_segments: int,
                    source_path: Optional[str] = None) -> bool:
    """Concatenate part files (stream copy) and map the original audio and
    subtitles; removes parts + manifest on success."""
    from dither_pie_tpu.pipeline.ffio import FFMPEG

    parts = [segment_part_path(output_path, i) for i in range(total_segments)]
    if not all(os.path.exists(p) for p in parts):
        return False
    list_path = output_path + ".concat.txt"
    Path(list_path).write_text(
        "".join(f"file '{os.path.abspath(p)}'\n" for p in parts))
    cmd = [FFMPEG, "-y", "-f", "concat", "-safe", "0", "-i", list_path]
    if source_path:
        cmd += ["-i", source_path, "-map", "0:v:0", "-map", "1:a?",
                "-map", "1:s?", "-c:v", "copy", "-c:a", "copy", "-c:s", "copy"]
    else:
        cmd += ["-c", "copy"]
    cmd += ["-v", "error", output_path]
    ok = subprocess.run(cmd).returncode == 0
    if ok:
        for p in parts:
            try:
                os.remove(p)
            except OSError:
                pass
        for p in (list_path, manifest_path(output_path)):
            try:
                os.remove(p)
            except OSError:
                pass
    return ok
