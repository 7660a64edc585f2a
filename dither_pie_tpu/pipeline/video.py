"""Video pipeline: ffmpeg rawvideo streaming -> host batch assembly ->
device-batched dithering -> streaming encode.

TPU-first redesign of /root/reference/video_processor.py:172-390: instead of
extracting every frame to PNG and fanning out to a multiprocessing pool, we
stream raw frames through pipes, assemble (B, H, W, 3) batches, and run one
device program per batch (batched wavefront scan for error diffusion, fused
vmapped kernels for ordered modes). The batch axis is also the sharding axis
for multi-chip meshes (see dither_pie_tpu/parallel/).

Reference semantics preserved:
  * one palette, computed from the FIRST frame, governs the whole video;
  * per-frame retry (x2) with nearest-good-frame patching on failure;
  * identical encoder settings (libx264 crf18 yuv420p, -vframes N, audio +
    subtitle stream copy);
  * progress callback protocol ``(fraction: float, message: str)``.

Frame sources are pluggable: any iterator of (H, W, 3) uint8 arrays works,
so the pipeline is testable without ffmpeg (tests feed synthetic frames).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from dither_pie_tpu.api.ditherer import ImageDitherer, PixelizeMethod
from dither_pie_tpu.api.profiling import stage
from dither_pie_tpu.pipeline import ffio
from dither_pie_tpu.pipeline.pixelize import get_neural_pixelizer, pixelize_regular

logger = logging.getLogger("dither_pie_tpu")

__all__ = ["VideoProcessor", "NeuralPixelizer", "pixelize_regular",
           "process_single_video", "process_frames"]


def _apply_final_resize_to_frame(arr: np.ndarray, multiplier: int,
                                 planar: bool = False) -> np.ndarray:
    """Integer nearest-neighbor upscale, even dims (yuv420p requirement).
    ``planar``: arr is (3, H, W) channel-major planes."""
    ha, wa = (1, 2) if planar else (0, 1)
    out = np.repeat(np.repeat(arr, multiplier, axis=ha), multiplier, axis=wa)
    nh, nw = out.shape[ha], out.shape[wa]
    pads = [(0, 0)] * 3
    if nh % 2 or nw % 2:
        pads[ha] = (0, nh % 2)
        pads[wa] = (0, nw % 2)
        out = np.pad(out, pads, mode="edge")
    return out


def _pixelize_frame(arr: np.ndarray, method: Optional[str], max_size: int) -> np.ndarray:
    if method in (PixelizeMethod.REGULAR.value, "regular"):
        img = Image.fromarray(arr)
        return np.array(pixelize_regular(img, max_size))
    if method in (PixelizeMethod.NEURAL.value, "neural"):
        img = Image.fromarray(arr)
        return np.array(get_neural_pixelizer().pixelize(img, max_size).convert("RGB"))
    return arr


def _pixelize_frames(arrs: List[np.ndarray], method: Optional[str],
                     max_size: int) -> List[np.ndarray]:
    """Batch-aware pixelization: the neural path stacks same-size frames
    into ONE device forward (vs the reference's sequential per-frame loop,
    /root/reference/video_processor.py:240-303); regular/none stay
    per-frame host resizes (they are microseconds)."""
    if method in (PixelizeMethod.NEURAL.value, "neural") and len(arrs) > 1:
        outs = get_neural_pixelizer().pixelize_batch(
            [Image.fromarray(a) for a in arrs], max_size)
        return [np.array(o.convert("RGB")) for o in outs]
    return [_pixelize_frame(a, method, max_size) for a in arrs]


def _prefetch(iterable: Iterable, depth: int) -> Iterator:
    """Pull from ``iterable`` on a background thread through a bounded queue
    so frame decode overlaps device compute (double buffering at the host
    level). Worker exceptions re-raise at the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
            q.put(done)
        except BaseException as e:  # propagate decode failures
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def process_frames(
    frames: Iterable[np.ndarray],
    ditherer: ImageDitherer,
    pixelize_func: Optional[Tuple[str, int]] = None,
    final_resize_multiplier: Optional[int] = None,
    batch_size: int = 16,
    progress: Optional[Callable[[float, str], None]] = None,
    total_frames: Optional[int] = None,
    retries: int = 2,
    prefetch: bool = True,
    overlap: bool = True,
    planar: bool = False,
) -> Iterator[np.ndarray]:
    """Core streaming transform: frames in -> processed frames out.

    Batches frames for the device; retries failed batches frame-by-frame;
    patches irrecoverable frames with the nearest previous good frame
    (or the next good one at the start of the stream).

    ``overlap=True`` pipelines the device work: batches are dispatched on a
    two-worker pool with up to two batches in flight, so batch N+1's
    H2D + compute runs while batch N's D2H drains and the main thread
    decodes/pixelizes N+2 and writes N-1 — the reference's pool overlapped
    I/O with compute the same way (video_processor.py:304-341); a
    serialized device loop leaves the chip idle during every transfer.
    Results are emitted strictly in order either way.

    ``planar=True``: frames are (3, H, W) channel-major planes in AND out
    (the zero-copy ffmpeg-gbrp flow — see ffio.read_frames_planar /
    FrameWriter(planar=True)); requires a ditherer whose strategy has a
    planar wavefront kernel (``ImageDitherer.supports_planar_batch``) and
    no pixelize stage (pixelization operates on interleaved images).
    """
    if planar and pixelize_func:
        raise ValueError("planar frames do not compose with a pixelize "
                         "stage; use the interleaved flow")
    if prefetch:
        frames = _prefetch(frames, depth=2 * batch_size)
    method, max_size = pixelize_func if pixelize_func else (None, 64)
    batch: List[np.ndarray] = []
    done = 0
    last_good: Optional[np.ndarray] = None
    pending_patch = 0  # leading frames that failed before any success

    def run_batch(arrs: List[np.ndarray]) -> List[Optional[np.ndarray]]:
        # Pad partial batches (e.g. the tail of a video) up to batch_size by
        # repeating the last frame, so the device program compiled for the
        # full batch shape is reused (compiles cost minutes on the dev
        # tunnel) and the batch axis stays mesh-shardable.
        n = len(arrs)
        padded = arrs + [arrs[-1]] * (batch_size - n) if n < batch_size else arrs
        # Planar frames are (3, H, W); the batch axis is axis 1 (3, B, H, W).
        stacked = np.stack(padded, axis=1) if planar else np.stack(padded)
        try:
            with stage("video.dither_batch"):
                out = ditherer.apply_dithering_batch(stacked, planar=planar)
            return [out[:, i] if planar else out[i] for i in range(n)]
        except Exception as e:
            logger.warning(f"Batch dither failed ({e}); retrying per frame")
            results: List[Optional[np.ndarray]] = []
            for arr in arrs:
                ok = None
                for _ in range(retries):
                    try:
                        if planar:
                            ok = ditherer.apply_dithering_batch(
                                arr[:, None], planar=True)[:, 0]
                        else:
                            ok = ditherer.apply_dithering_batch(arr[None])[0]
                        break
                    except Exception as ee:
                        logger.error(f"Frame failed: {ee}", exc_info=False)
                results.append(ok)
            return results

    def emit_results(results):
        nonlocal done, last_good, pending_patch
        for res in results:
            if res is None:
                if last_good is None:
                    # Leading failure: backfilled with the first good frame.
                    pending_patch += 1
                    continue
                logger.warning("Patched failed frame from nearest good frame")
                res = last_good.copy()
            else:
                last_good = res
            emit = res
            if final_resize_multiplier:
                emit = _apply_final_resize_to_frame(emit, final_resize_multiplier,
                                                    planar=planar)
            # Backfill any leading failures with this first good frame.
            for _ in range(pending_patch):
                done += 1
                yield emit.copy()
            pending_patch = 0
            done += 1
            yield emit
            if progress and total_frames and done % 5 == 0:
                progress(0.1 + 0.8 * done / total_frames,
                         f"Processed {done}/{total_frames} frames")

    def pixelized(arrs):
        with stage("video.pixelize"):
            return _pixelize_frames(arrs, method, max_size)

    if not overlap:
        for frame in frames:
            batch.append(np.asarray(frame))
            if len(batch) >= batch_size:
                yield from emit_results(run_batch(pixelized(batch)))
                batch.clear()
        if batch:
            yield from emit_results(run_batch(pixelized(batch)))
        return

    import collections
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=2,
                            thread_name_prefix="dither-batch")
    pending: "collections.deque" = collections.deque()
    try:
        for frame in frames:
            batch.append(np.asarray(frame))
            if len(batch) >= batch_size:
                # Pixelize on the main thread (the neural path owns the
                # device program for its own batch), then hand the dither
                # to the pool.
                pending.append(ex.submit(run_batch, pixelized(batch)))
                batch.clear()
                while len(pending) > 2:
                    yield from emit_results(pending.popleft().result())
        if batch:
            pending.append(ex.submit(run_batch, pixelized(batch)))
            batch.clear()
        while pending:
            yield from emit_results(pending.popleft().result())
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


class VideoProcessor:
    """Streaming video processing with device-batched dithering.

    API-compatible with the reference's VideoProcessor (constructor takes an
    optional progress callback; ``process_video_streaming`` takes a built
    ImageDitherer plus the pixelize tuple).
    """

    def __init__(self,
                 num_workers: Optional[int] = None,  # accepted for API parity
                 progress_callback: Optional[Callable[[float, str], None]] = None,
                 batch_size: int = 16):
        self.num_workers = num_workers
        self.progress_callback = progress_callback
        self.batch_size = batch_size

    def _report_progress(self, fraction: float, message: str):
        if self.progress_callback:
            self.progress_callback(fraction, message)

    def get_video_info(self, video_path: str) -> dict:
        return ffio.probe_video(video_path)

    def process_video_streaming(self,
                                input_path: str,
                                output_path: str,
                                ditherer: ImageDitherer,
                                pixelize_func: Optional[Tuple[str, int]] = None,
                                batch_size: Optional[int] = None,
                                final_resize_multiplier: Optional[int] = None,
                                resume: bool = False,
                                segment_size: int = 300,
                                host_index: int = 0,
                                host_count: int = 1) -> bool:
        """``host_index``/``host_count`` shard the segment grid across hosts
        (parallel/multihost.py): host k processes segments
        ``i % host_count == k`` only; the final concat runs on whichever
        host sees every part file present (shared filesystem). Implies the
        segmented path."""
        if not ffio.video_available():
            logger.error("No video backend available (need ffmpeg on PATH, "
                         "or OpenCV as a video-only fallback)")
            return False
        if resume or host_count > 1:
            return self._process_segmented(
                input_path, output_path, ditherer, pixelize_func,
                batch_size or self.batch_size, final_resize_multiplier,
                segment_size, host_index=host_index, host_count=host_count)
        try:
            info = self.get_video_info(input_path)
            fps, w, h = info["fps"], info["width"], info["height"]
            total = info.get("frame_count")
            self._report_progress(0.0, "Initializing video processing...")

            # Zero-copy planar flow: ffmpeg emits gbrp planes, the packed
            # wavefront kernel consumes/produces planes natively, and the
            # encoder takes gbrp back — no interleave anywhere (the
            # reference pays a per-frame HWC<->planar shuffle implicitly in
            # its PNG round-trip, video_processor.py:172-390).
            use_planar = pixelize_func is None and ditherer.supports_planar_batch()
            reader = (ffio.read_frames_planar(input_path, w, h) if use_planar
                      else ffio.read_frames(input_path, w, h))
            writer: Optional[ffio.FrameWriter] = None
            n_written = 0

            self._report_progress(0.05, "Streaming frames...")
            for out in process_frames(
                    reader, ditherer, pixelize_func=pixelize_func,
                    final_resize_multiplier=final_resize_multiplier,
                    batch_size=batch_size or self.batch_size,
                    progress=self._report_progress, total_frames=total,
                    planar=use_planar):
                if writer is None:
                    oh, ow = out.shape[1:3] if use_planar else out.shape[:2]
                    writer = ffio.FrameWriter(output_path, ow, oh, fps,
                                              source_path=input_path,
                                              total_frames=total,
                                              planar=use_planar)
                writer.write(out)
                n_written += 1

            if writer is None:
                raise ValueError("No frames extracted from video")
            self._report_progress(0.9, "Finalizing encode...")
            ok = writer.close()
            self._report_progress(1.0, "Video processing complete!")
            return ok and n_written > 0
        except Exception as e:
            self._report_progress(1.0, f"Error: {e}")
            logger.error(f"Video processing error: {e}", exc_info=True)
            return False


    # A concat of even a long video is minutes; an hour-old lock means the
    # holder is gone (crashed or SIGKILLed mid-concat).
    CONCAT_LOCK_STALE_S = 3600.0

    @classmethod
    def _claim_concat_lock(cls, lock: str) -> bool:
        """Atomically claim ``lock``, reclaiming stale locks.

        The lock file records ``pid hostname``. It is considered dead (and
        reclaimed) when the recorded pid no longer exists on THIS host, or
        when the file is older than CONCAT_LOCK_STALE_S on any host. Returns
        True when this process holds the lock."""
        import os
        import socket
        import time

        for _ in range(2):  # initial try + one retry after reclaiming
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(f"{os.getpid()} {socket.gethostname()}")
                return True
            except FileExistsError:
                pass
            try:
                stat = os.stat(lock)
                holder_pid, holder_host = None, None
                with open(lock) as f:
                    parts = f.read().split()
                    if len(parts) >= 2:
                        holder_pid, holder_host = int(parts[0]), parts[1]
            except (OSError, ValueError):
                continue  # holder finished (file gone) or mid-write: retry
            stale = (time.time() - stat.st_mtime) > cls.CONCAT_LOCK_STALE_S
            dead_local = False
            if holder_pid is not None and holder_host == socket.gethostname():
                try:
                    os.kill(holder_pid, 0)
                except ProcessLookupError:
                    dead_local = True
                except OSError:
                    pass
            if stale or dead_local:
                logger.warning(f"Reclaiming dead concat lock {lock} "
                               f"(holder pid={holder_pid} host={holder_host})")
                try:
                    os.remove(lock)
                except OSError:
                    pass
                continue
            return False
        return False

    @staticmethod
    def _settings_fingerprint(ditherer: ImageDitherer, pixelize_func,
                              final_resize_multiplier) -> str:
        """Stable hash of everything that shapes the output pixels, so a
        rerun with different settings never resumes (or concatenates) stale
        part files from a previous job."""
        import hashlib
        import json as _json

        def norm(v):
            # Full-value normalization: numpy arrays stringify with '...'
            # truncation above 1000 elements under default=str, which would
            # let two different large custom settings (e.g. threshold
            # matrices) collide to one fingerprint.
            if isinstance(v, np.ndarray):
                return v.tolist()
            if isinstance(v, (np.integer, np.floating, np.bool_)):
                return v.item()
            if isinstance(v, dict):
                return {str(k): norm(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [norm(x) for x in v]
            return v

        payload = {
            "mode": getattr(ditherer.dither_mode, "value",
                            str(ditherer.dither_mode)),
            "num_colors": ditherer.num_colors,
            "use_gamma": ditherer.use_gamma,
            "params": norm(ditherer.dither_params),
            "palette": norm(ditherer.palette),
            "pixelize": list(pixelize_func) if pixelize_func else None,
            "resize": final_resize_multiplier,
        }
        return hashlib.md5(_json.dumps(payload, sort_keys=True,
                                       default=str).encode()).hexdigest()

    def _process_segmented(self, input_path: str, output_path: str,
                           ditherer: ImageDitherer,
                           pixelize_func, batch_size: int,
                           final_resize_multiplier, segment_size: int,
                           host_index: int = 0, host_count: int = 1) -> bool:
        """Checkpoint/resume path: encode fixed-size segments to part files
        with a manifest; re-running skips completed segments; parts are
        concatenated (stream copy) with the original audio mapped in.

        With ``host_count > 1`` this host processes only its strided share
        of the segment grid (parallel/multihost.py) and records them in a
        per-host manifest; the concat runs only once every segment's part
        exists, so each host returns True when ITS share is done."""
        import itertools
        import os

        from dither_pie_tpu.parallel.multihost import host_segments
        from dither_pie_tpu.pipeline import resume as rz

        if not ffio.ffmpeg_available():
            if host_count > 1:
                logger.error("Multi-host sharding needs ffmpeg "
                             "(segment encode/concat)")
                return False
            logger.warning("Resume mode needs ffmpeg (segment concat); "
                           "falling back to single-pass processing")
            return self.process_video_streaming(
                input_path, output_path, ditherer,
                pixelize_func=pixelize_func, batch_size=batch_size,
                final_resize_multiplier=final_resize_multiplier)
        try:
            info = self.get_video_info(input_path)
            fps, w, h = info["fps"], info["width"], info["height"]
            total = info.get("frame_count")
            if not total:
                if host_count > 1:
                    logger.error("Unknown frame count; cannot shard video")
                    return False
                logger.warning("Unknown frame count; resume unavailable — "
                               "falling back to single-pass processing")
                return self.process_video_streaming(
                    input_path, output_path, ditherer,
                    pixelize_func=pixelize_func, batch_size=batch_size,
                    final_resize_multiplier=final_resize_multiplier)

            expect = {"input": os.path.abspath(input_path),
                      "fps": round(fps, 5), "segment_size": segment_size,
                      "total_frames": total,
                      "settings": self._settings_fingerprint(
                          ditherer, pixelize_func, final_resize_multiplier)}
            completed = rz.load_manifest(output_path, expect,
                                         host_index=host_index)
            n_seg = rz.n_segments(total, segment_size)
            mine = host_segments(n_seg, host_index, host_count)
            if completed:
                logger.info(f"Resuming: {len(completed)}/{len(mine)} "
                            f"of this host's segments done")

            # Same zero-copy planar selection as the single-pass flow.
            use_planar = (pixelize_func is None
                          and ditherer.supports_planar_batch())
            reader = (ffio.read_frames_planar(input_path, w, h) if use_planar
                      else ffio.read_frames(input_path, w, h))
            frames_done = 0
            for seg in range(n_seg):
                start = seg * segment_size
                end = min(start + segment_size, total)
                count = end - start
                if seg not in mine or seg in completed:
                    # Another host's segment, or already encoded:
                    # decode-and-discard to stay aligned.
                    for _ in itertools.islice(reader, count):
                        pass
                    frames_done += count
                    continue
                # Encode to a tmp name, rename when complete: a part file
                # must never be visible half-written (other hosts gate the
                # concat on part existence).
                part = rz.segment_part_path(output_path, seg)
                tmp = rz.segment_tmp_path(output_path, seg)
                writer = None
                n_written = 0
                for out in process_frames(
                        itertools.islice(reader, count), ditherer,
                        pixelize_func=pixelize_func,
                        final_resize_multiplier=final_resize_multiplier,
                        batch_size=batch_size, planar=use_planar):
                    if writer is None:
                        oh, ow = out.shape[1:3] if use_planar else out.shape[:2]
                        writer = ffio.FrameWriter(tmp, ow, oh, fps,
                                                  planar=use_planar)
                    writer.write(out)
                    n_written += 1
                if writer is None or not writer.close() or n_written != count:
                    logger.error(f"Segment {seg} failed "
                                 f"({n_written}/{count} frames)")
                    return False
                os.replace(tmp, part)
                completed.add(seg)
                rz.save_manifest(output_path, expect, completed,
                                 host_index=host_index)
                frames_done += count
                self._report_progress(0.05 + 0.85 * frames_done / total,
                                      f"Segment {seg + 1}/{n_seg} done")

            if host_count > 1:
                # Concat only when every segment is covered by a manifest
                # MATCHING this job's settings fingerprint AND its part
                # exists — stale parts from an older run with different
                # settings can never be concatenated.
                covered = rz.load_all_manifests(output_path, expect,
                                                host_count)
                if (covered != set(range(n_seg))
                        or not rz.all_parts_present(output_path, n_seg)):
                    logger.info("This host's segments are done; waiting on "
                                "other hosts' parts before concat")
                    self._report_progress(
                        1.0, "Host share complete (concat pending)")
                    return True
                # Claim the concat atomically (two hosts can finish at the
                # same time); the loser reports success-pending. The lock is
                # reclaimable: a holder that died mid-concat (dead local pid,
                # or a lock older than the stale age from any host) would
                # otherwise block every future rerun forever.
                lock = output_path + ".concat.lock"
                if not self._claim_concat_lock(lock):
                    logger.info("Another host is concatenating")
                    self._report_progress(
                        1.0, "Host share complete (concat in progress)")
                    return True
                try:
                    self._report_progress(0.92, "Concatenating segments...")
                    ok = rz.concat_segments(output_path, n_seg,
                                            source_path=input_path)
                finally:
                    try:
                        os.remove(lock)
                    except OSError:
                        pass
                self._report_progress(1.0, "Video processing complete!"
                                      if ok else "Concat failed")
                return ok
            self._report_progress(0.92, "Concatenating segments...")
            ok = rz.concat_segments(output_path, n_seg, source_path=input_path)
            self._report_progress(1.0, "Video processing complete!"
                                  if ok else "Concat failed")
            return ok
        except Exception as e:
            self._report_progress(1.0, f"Error: {e}")
            logger.error(f"Segmented video processing error: {e}", exc_info=True)
            return False


class NeuralPixelizer:
    """API-parity wrapper delegating to the Flax neural pixelizer singleton
    (reference surface: video_processor.py:478-560)."""

    def __init__(self, device: Optional[str] = None):
        self._impl = get_neural_pixelizer()

    def pixelize(self, image: Image.Image, max_size: int) -> Image.Image:
        return self._impl.pixelize(image, max_size)


def process_single_video(config: Dict[str, Any], neural_pixelizer=None,
                         resume: bool = False,
                         host_index: int = 0, host_count: int = 1) -> bool:
    """Config-driven video processing (reference surface:
    dither_cli.py:593-710): palette from first frame, then stream.
    ``host_index``/``host_count`` shard the segment grid across hosts
    (CLI ``--shard INDEX:COUNT``; see parallel/multihost.py)."""
    from dither_pie_tpu.pipeline.image import build_ditherer

    try:
        input_path = Path(config["input"])
        output_path = Path(config["output"])
        logger.info(f"Processing video: {input_path.name}")

        if not ffio.video_available():
            logger.error("No video backend available (need ffmpeg on PATH, "
                         "or OpenCV as a video-only fallback)")
            return False

        processor = VideoProcessor()
        info = processor.get_video_info(str(input_path))
        logger.info(f"Video: {info['width']}x{info['height']}, "
                    f"{info['fps']:.2f} fps, {info['frame_count']} frames")

        logger.info("Loading first frame for palette generation...")
        first = ffio.read_single_frame(str(input_path), 0)
        if first is None:
            logger.error("Could not decode first frame")
            return False

        try:
            ditherer = build_ditherer(config, Image.fromarray(first))
        except ValueError:
            logger.error(f"Invalid dither mode: {config['dithering']['mode']}")
            return False

        pixelize_func = None
        if config["pixelization"]["enabled"]:
            method = config["pixelization"]["method"]
            if method in (PixelizeMethod.REGULAR.value, PixelizeMethod.NEURAL.value):
                pixelize_func = (method, config["pixelization"]["max_size"])
                if method == PixelizeMethod.NEURAL.value and neural_pixelizer is None:
                    logger.info("Loading neural pixelization models...")
                    get_neural_pixelizer()

        final_resize = (config["final_resize"]["multiplier"]
                        if config["final_resize"]["enabled"] else None)

        output_path.parent.mkdir(parents=True, exist_ok=True)

        from dither_pie_tpu.cli.main import CLIProgressCallback

        cb = CLIProgressCallback()
        processor = VideoProcessor(progress_callback=lambda f, m: cb.update(f, m))
        logger.info("Processing video frames...")
        with cb:
            ok = processor.process_video_streaming(
                str(input_path), str(output_path), ditherer,
                pixelize_func=pixelize_func,
                final_resize_multiplier=final_resize,
                resume=resume,
                host_index=host_index, host_count=host_count)
        if ok:
            if output_path.exists():
                size_mb = output_path.stat().st_size / (1024 * 1024)
                logger.info(f"Video processed successfully ({size_mb:.1f} MB)")
            else:
                # Multi-host: this host's share is done; the final concat
                # runs on whichever host sees every part present.
                logger.info("Host share complete (final concat pending on "
                            "other hosts)")
            return True
        logger.error("Video processing failed")
        return False
    except KeyboardInterrupt:
        logger.warning("Video processing interrupted by user")
        raise
    except Exception as e:
        logger.error(f"Failed to process video: {e}", exc_info=True)
        return False
