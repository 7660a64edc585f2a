"""Side-by-side video compositor (reference surface: misc/vid_conc.py).

Two-stage ffmpeg flow: sanitize each input (re-encode to a common fps /
pixel format), then hstack/vstack with neighbor scaling and optional audio
amerge. Run: ``python -m dither_pie_tpu.tools.vid_conc a.mp4 b.mp4 out.mp4``.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path

from dither_pie_tpu.pipeline.ffio import FFMPEG, ffmpeg_available, probe_video


def _sanitize(src: str, dst: str, fps: float, height: int):
    cmd = [FFMPEG, "-y", "-i", src,
           "-vf", f"scale=-2:{height},fps={fps:.5f}",
           "-c:v", "libx264", "-preset", "fast", "-crf", "18",
           "-pix_fmt", "yuv420p", "-c:a", "aac", "-v", "error", dst]
    subprocess.run(cmd, check=True)


def concat_side_by_side(inputs, output: str, vertical: bool = False,
                        merge_audio: bool = True) -> bool:
    if not ffmpeg_available():
        print("ffmpeg not found on PATH", file=sys.stderr)
        return False
    infos = [probe_video(p) for p in inputs]
    fps = max(i["fps"] for i in infos)
    height = min(i["height"] for i in infos)
    height -= height % 2
    stack = "vstack" if vertical else "hstack"
    with tempfile.TemporaryDirectory() as td:
        clean = []
        for i, src in enumerate(inputs):
            dst = str(Path(td) / f"clean_{i}.mp4")
            _sanitize(src, dst, fps, height)
            clean.append(dst)
        n = len(clean)
        fc = "".join(f"[{i}:v]" for i in range(n)) + f"{stack}=inputs={n}[v]"
        cmd = [FFMPEG, "-y"]
        for c in clean:
            cmd += ["-i", c]
        maps = ["-map", "[v]"]
        if merge_audio:
            fc += ";" + "".join(f"[{i}:a]" for i in range(n)) + \
                  f"amerge=inputs={n}[a]"
            maps += ["-map", "[a]", "-ac", "2"]
        cmd += ["-filter_complex", fc, *maps,
                "-c:v", "libx264", "-crf", "18", "-pix_fmt", "yuv420p",
                "-v", "error", output]
        try:
            subprocess.run(cmd, check=True)
        except subprocess.CalledProcessError:
            # Retry without audio (inputs may be silent).
            fc = "".join(f"[{i}:v]" for i in range(n)) + f"{stack}=inputs={n}[v]"
            cmd = [FFMPEG, "-y"]
            for c in clean:
                cmd += ["-i", c]
            cmd += ["-filter_complex", fc, "-map", "[v]",
                    "-c:v", "libx264", "-crf", "18", "-pix_fmt", "yuv420p",
                    "-v", "error", output]
            subprocess.run(cmd, check=True)
    return True


def main():
    ap = argparse.ArgumentParser(description="Stack videos side by side")
    ap.add_argument("inputs", nargs="+", help="input videos (last arg = output)")
    ap.add_argument("--vertical", action="store_true")
    ap.add_argument("--no-audio", action="store_true")
    args = ap.parse_args()
    if len(args.inputs) < 3:
        ap.error("need at least two inputs and one output")
    *ins, out = args.inputs
    ok = concat_side_by_side(ins, out, vertical=args.vertical,
                             merge_audio=not args.no_audio)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
