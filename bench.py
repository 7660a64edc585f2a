#!/usr/bin/env python
"""Benchmark: prints ONE JSON line with the headline metric.

All five BASELINE.md configs, honestly measured:
  1. single 512x512 Bayer 8x8 -> 16 colors: per-image LATENCY (fused kernel)
  2. 1080p Floyd-Steinberg, k-means-extracted 32-color palette, through the
     FULL device path (skew + wavefront scan + unskew + palette take)
  3. batch of 100 x 1080p, blue-noise and IGN, custom (builtin pico8) palette
  4. 720p/30 Stucki video END-TO-END through the video pipeline (wall clock
     incl. decode/encode + host<->device transfer), plus the device-sustained
     Stucki number
  5. 1080p neural pixelization (random weights, architecture-correct) +
     hybrid dither, wall clock per frame through the batched video path
Plus an on-chip fidelity spot-check (wavefront kernels vs the C++ golden
engine — bit-identity fractions).

Methodology: device-sustained numbers time K back-to-back kernel executions
inside a single jitted dispatch (differential K vs 1, median of repeats),
because the dev harness reaches the TPU through a network relay whose
per-dispatch latency and host-link bandwidth (~40 MB/s in, ~1 MB/s out) are
artifacts of the tunnel, not the chip. End-to-end numbers (configs 4, 5) are
honest wall clock INCLUDING that tunnel transfer and are labeled with the
measured link bandwidth so they can be read against production host links.

Survivability (the r04 driver capture timed out with no JSON record):
  * the headline JSON line is emitted right after config 2 (marked
    ``"partial": true``) and re-emitted enriched at the end — a killed run
    still leaves a parseable record;
  * BENCH_TIME_BUDGET_S (default 1080) stops STARTING new budgeted configs
    once exceeded; configs 1+2 and the fidelity gate are exempt, and the
    slow dense-palette cells (2b-512 / 2b-1024 / 2b-mxu) run last;
  * config 1 (the latency microbench) runs after the headline and
    self-caps at BENCH_CFG1_CAP_S (default 180 s): a degraded relay
    (observed: ~25 s per dispatch round-trip) once let its ~52 round-trips
    eat 1282 s and starve everything downstream;
  * per-config wall times land in details.config_times_s so the budget can
    be resized from any capture;
  * BENCH_SMALL / BENCH_CONFIGS dev invocations report ledger deltas but
    never persist to bench_ledger.jsonl.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_image(h, w, seed=0):
    """Photo-like synthetic frame: smooth gradients + blobs + noise (k-means
    on pure noise is meaningless; this has real color structure)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        128 + 110 * np.sin(2 * np.pi * (x / w + 0.1 * np.sin(y / 97.0))),
        128 + 90 * np.cos(2 * np.pi * (y / h + 0.2)),
        128 + 100 * np.sin(2 * np.pi * ((x + y) / (h + w))),
    ], axis=-1)
    for _ in range(6):
        cy, cx, r = rng.randint(0, h), rng.randint(0, w), rng.randint(30, 200)
        mask = ((y - cy) ** 2 + (x - cx) ** 2) < r * r
        img[mask] = img[mask] * 0.5 + rng.randint(0, 256, 3) * 0.5
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# Round-over-round regression ledger (VERDICT r03 item 7): headline metrics
# appended to a committed JSONL per bench run; each run prints deltas vs the
# previous entry so a silent slide (e.g. the unexplained r02->r03 Bayer
# 1.82 -> 1.57 GPix/s move) is visible the moment it happens.
LEDGER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_ledger.jsonl")
LEDGER_KEYS = (
    "latency_512_bayer8x8_ms",
    "fs_1080p_kmeans32_fps_e2e_device",
    "fs_1080p_pal256_fps_e2e_device",
    "fs_1080p_planar_fps_e2e_device",
    "bayer8x8_1080p_gpix_per_s",
    "bluenoise_100x1080p_gpix_s",
    "ign_100x1080p_gpix_s",
    "stucki_720p_device_fps",
    "neural_forward_bf16_fps",
)


def update_ledger(details, label=None, persist=True):
    """Append headline metrics to the ledger; print deltas vs the last entry.

    ``persist=False``: report deltas but write nothing (smoke/dev runs
    whose shape-degenerate numbers must not become the next real run's
    baseline). Returns {key: pct_change} for moves >= 10% (signed).
    """
    entry = {"label": label or time.strftime("%Y-%m-%d %H:%M:%S"),
             "platform": details.get("platform"),
             "jax": details.get("jax_version")}
    n_base = len(entry)
    for k in LEDGER_KEYS:
        if isinstance(details.get(k), (int, float)):
            entry[k] = details[k]
    prev = None
    try:
        with open(LEDGER_PATH) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    # One truncated line (run killed mid-append) must not
                    # disable delta reporting or block the append below.
                    continue
                # Compare like-for-like: only prior runs on the same platform.
                if cand.get("platform") == entry["platform"]:
                    prev = cand
    except FileNotFoundError:
        pass
    big_moves = {}
    if prev:
        for k in LEDGER_KEYS:
            a, b = prev.get(k), entry.get(k)
            if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a:
                pct = 100.0 * (b - a) / a
                arrow = "^" if pct >= 0 else "v"
                flag = "  <-- >10% move" if abs(pct) >= 10 else ""
                log(f"ledger {k}: {a} -> {b} ({arrow}{abs(pct):.1f}%)"
                    f" vs '{prev.get('label')}'{flag}")
                if abs(pct) >= 10:
                    big_moves[k] = round(pct, 1)
    if not persist:
        return big_moves
    if len(entry) > n_base:  # only persist runs that actually measured something
        try:
            with open(LEDGER_PATH, "a") as f:
                f.write(json.dumps(entry) + "\n")
        except OSError as e:
            log(f"ledger append failed: {e!r}")
    return big_moves


def _accelerator_alive(timeout=240):
    """Probe backend init in a SUBPROCESS (a wedged relay HANGS
    jax.devices() rather than erroring). Shared with the CLI/library
    path — one probe implementation, one disk-cached verdict, so a bench
    run right after a CLI run doesn't re-pay the probe timeout."""
    from dither_pie_tpu.api.runtime import _accelerator_responsive
    return _accelerator_responsive(timeout)


def main():
    import jax
    import jax.numpy as jnp

    from dither_pie_tpu.api.cache import enable_compilation_cache

    enable_compilation_cache()

    platform = None
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not _accelerator_alive():
        log("accelerator backend unreachable (subprocess probe); "
            "falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
    for attempt in range(6):
        if platform is not None:
            break
        try:
            jax.devices()
            platform = jax.default_backend()
            break
        except Exception as e:
            log(f"backend init attempt {attempt}: {e}")
            time.sleep(10)
    if platform is None:
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
    cpu = platform == "cpu"
    log(f"platform: {platform}, devices: {jax.devices()}")

    small = os.environ.get("BENCH_SMALL") == "1"  # CI smoke on CPU
    forced_fallback = False
    if cpu and not small:
        # Accelerator-outage fallback: full-size shapes through the
        # interpret-mode Pallas path would not finish in any driver
        # window (1080p batch-16 interpret = hours). A small honest smoke
        # that completes and emits a labeled record beats an rc=124 with
        # no JSON at all.
        small = True
        forced_fallback = True
        log("cpu fallback: forcing BENCH_SMALL shapes so the run "
            "completes; record labeled cpu_fallback_smoke")

    # BENCH_CONFIGS="4,5" reruns only the named configs (development /
    # methodology validation; the driver runs everything). Standalone:
    # 1, 2, 3, A, link, 4, 4b, 5, 6, fidelity, dense. 2b/2bm and 2p reuse
    # config 2's buffers -- include "2" when selecting them.
    only = os.environ.get("BENCH_CONFIGS")

    # Wall-clock budget (VERDICT r04 #1): the r04 driver capture timed out
    # (rc=124, no JSON emitted) after the slow dense cells ran mid-stream.
    # Once ``budget_s`` is exceeded no NEW budgeted config starts; whatever
    # already ran still gets its fidelity gate, ledger deltas, and the
    # final JSON line. Configs 1+2 and the fidelity gate are exempt (the
    # headline must exist); the slow dense-palette cells run LAST.
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", "1080"))
    t_start = time.time()
    budget_skipped = []
    cfg_times = {}
    _last_cfg = {"name": None, "t": t_start}

    class _SkipBench(Exception):
        pass

    def _gate(name: str, budget: bool = True):
        # Attribute elapsed time to the previous config (approximate but
        # zero-instrumentation: each _gate call closes the prior section).
        now = time.time()
        if _last_cfg["name"] is not None:
            cfg_times[_last_cfg["name"]] = round(
                cfg_times.get(_last_cfg["name"], 0.0)
                + now - _last_cfg["t"], 1)
        _last_cfg["name"], _last_cfg["t"] = name, now
        if only is not None and name not in only.split(","):
            raise _SkipBench()
        if budget and now - t_start > budget_s:
            budget_skipped.append(name)
            log(f"budget: skipping config {name} "
                f"({now - t_start:.0f}s elapsed > {budget_s:.0f}s budget)")
            raise _SkipBench()
    H, W = (96, 128) if small else (1080, 1920)
    mpix = H * W / 1e6
    rng = np.random.RandomState(0)
    import jaxlib

    details = {"platform": platform,
               # Toolchain identity: two standing decisions (host
               # Riemersma, no sub-linear dense search) are measurements
               # conditional on jax/libtpu — a version change here is the
               # re-measurement trigger (VERDICT r04 #8).
               "jax_version": jax.__version__,
               "jaxlib_version": jaxlib.__version__,
               "method": "K-chained in-dispatch differential for "
                         "device-sustained; wall clock for e2e"}
    if forced_fallback:
        details["cpu_fallback_smoke"] = True  # outage record, not a perf run
    errors = {}

    def timed_pair(f1, fk, k, rounds=3):
        """Median-of-``rounds`` differential timing of jitted f1 vs fk
        (k executions): a single (tk - t1) diff is noise-degenerate
        through the relay's per-dispatch jitter."""
        _ = np.asarray(f1())  # compile
        _ = np.asarray(fk())

        def med(f, n=5):
            ts = []
            for _ in range(n):
                t0 = time.time()
                _ = np.asarray(f())
                ts.append(time.time() - t0)
            return sorted(ts)[n // 2]

        diffs = [max((med(fk) - med(f1)) / (k - 1), 1e-9)
                 for _ in range(rounds)]
        return float(np.median(diffs))

    from dither_pie_tpu.core.thresholds import bayer_matrix, blue_noise_cached, \
        ign_thresholds
    from dither_pie_tpu.ops.ordered import tile_screen_device
    from dither_pie_tpu.ops.ordered_pallas import ordered_dither_fused
    from dither_pie_tpu.utils import PaletteManager

    palette16 = jnp.asarray(rng.randint(0, 256, (16, 3)).astype(np.float32))

    # ---- Config 1: single 512x512 Bayer 8x8 -> 16 colors, LATENCY ---------
    # Runs AFTER config 2 (the headline): on a pathologically slow relay
    # (observed 2026-08-21: ~25 s per dispatch round-trip) this microbench's
    # ~52 round-trips once ate 1282 s and starved every later config, so it
    # (a) yields first place to the headline and (b) self-caps on wall
    # clock (BENCH_CFG1_CAP_S, default 180 s): timing rounds stop early and
    # the median of what ran is reported, with the truncation noted.
    def _config1():
        _gate("1", budget=False)
        import itertools

        from jax import lax

        hs, ws = (64, 64) if small else (512, 512)
        # Distinct input per repeat: the dev relay dedupes byte-identical
        # small dispatches, which zeroes the differential otherwise — and
        # the dedup cache survives ACROSS processes (observed: a rerun
        # with the same seeds measured 0.000 ms), so salt the seeds with
        # the pid.
        salt = (os.getpid() * 1009) % 1_000_000
        imgs1 = [jnp.asarray(synth_image(hs, ws, 1 + i + salt)[None])
                 for i in range(14)]
        screen1 = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), hs, ws)

        # lax.fori_loop chain (VERDICT r04 #2): the old 64-step UNROLLED
        # chain put a ~0.65 ms total differential against the relay's
        # multi-ms per-dispatch jitter — that methodology noise is the
        # whole 0.0104 -> 0.046 ms r03->r04 move. The carried xor makes
        # every iteration data-dependent (no CSE/dedup), the loop body
        # compiles ONCE (so k can be 256 without a Mosaic unroll blowup),
        # and the 256-step differential (~3-12 ms) sits well above the
        # jitter floor. The ledger now tracks this key round-over-round.
        K1 = 16 if small else 256

        # Per-call scalar salt: the image pool is finite (14), so timing
        # rounds eventually REUSE an (image, program) pair — and the relay
        # dedups byte-identical dispatches, zeroing the differential
        # (observed 2026-08-21: median collapsed to the 1e-9 floor ->
        # 0.0 ms). A fresh int32 arg per call makes every dispatch payload
        # unique, and the salt feeds the xor chain so it can't be CSE'd.
        call_salt = itertools.count(salt)

        def single_many(k):
            @jax.jit
            def f(img, s0, palette, screen):
                def body(i, out):
                    return ordered_dither_fused(
                        jnp.bitwise_xor(out, (i + 1 + s0).astype(jnp.uint8)),
                        palette, screen, interpret=cpu, bucket=False)
                return lax.fori_loop(0, k, body, img)
            pool = itertools.cycle(imgs1)
            return lambda: f(next(pool), jnp.int32(next(call_salt) & 0x7F),
                            palette16, screen1)

        t_c1 = time.time()
        cap1 = float(os.environ.get("BENCH_CFG1_CAP_S", "180"))
        f1, fk = single_many(1), single_many(K1)
        _ = np.asarray(f1()); _ = np.asarray(fk())  # compile

        def med1(f, n=5):
            ts = []
            for _ in range(n):
                t0 = time.time()
                _ = np.asarray(f())
                ts.append(time.time() - t0)
                if time.time() - t_c1 > cap1:
                    break
            return sorted(ts)[len(ts) // 2]

        rounds1 = []
        while len(rounds1) < 5:
            rounds1.append(max((med1(fk) - med1(f1)) / (K1 - 1), 1e-9))
            if time.time() - t_c1 > cap1:
                break
        capped = " (wall-capped, relay-degraded)" if len(rounds1) < 5 else ""
        per1 = float(np.median(rounds1))
        # Sanity floor: 512^2 x 16 colors can't run in < 5 us on this chip
        # (observed healthy readings 10-60 us); a sub-floor median means
        # the differential collapsed (relay dedup / jitter inversion) and
        # must not be persisted as a real number.
        if per1 < 5e-6:
            details["latency_512_bayer8x8_ms_invalid"] = round(per1 * 1e3, 6)
            details["latency_512_method"] = (
                "DEGENERATE differential (relay dedup/jitter collapsed the "
                f"median to {per1*1e3:.6f} ms); excluded from the ledger")
            log(f"1: 512^2 bayer latency DEGENERATE ({per1*1e3:.6f} ms) — "
                "excluded")
            return
        details["latency_512_bayer8x8_ms"] = round(per1 * 1000, 4)
        details["latency_512_bayer8x8_ms_spread"] = [
            round(min(rounds1) * 1000, 4), round(max(rounds1) * 1000, 4)]
        details["latency_512_method"] = (
            f"fori_loop {K1}-chain differential, median of {len(rounds1)} "
            f"round(s) of median-of-5 timings{capped}; r04's 0.046 vs "
            "r03's 0.0104 ms was relay jitter on the old 64-unroll's "
            "sub-ms differential")
        log(f"1: 512^2 bayer latency {per1*1e3:.4f} ms/image "
            f"(spread {details['latency_512_bayer8x8_ms_spread']}{capped})")

    # ---- Config 2 (headline): 1080p FS, k-means 32-color palette, FULL
    # device path (skew + scan + unskew + take) ------------------------------
    fs_fps = 0.0

    def emit_result(partial: bool = False):
        """Print the headline JSON line. Called TWICE: right after config 2
        (so a driver-side timeout still captures a parseable record — the
        r04 run died with parsed=null) and again, enriched, at the end.
        The driver parses the LAST JSON line, so the final emission wins
        when the run completes."""
        d = dict(details)
        if partial:
            d["partial"] = True
        print(json.dumps({
            "metric": "1080p Floyd-Steinberg dither throughput "
                      "(full device path, k-means-32 palette)",
            "value": round(fs_fps, 1),
            "unit": "fps",
            "vs_baseline": round(fs_fps / 300.0, 3),
            "details": d,
        }), flush=True)

    try:
        _gate("2", budget=False)
        from dither_pie_tpu.api.ditherer import ColorReducer
        from dither_pie_tpu.ops import wavefront as wf
        from PIL import Image

        frame2 = synth_image(H, W, 2)
        pal32 = np.asarray(ColorReducer.generate_kmeans_palette(
            Image.fromarray(frame2), 32), np.float32)
        details["kmeans_palette_colors"] = int(pal32.shape[0])

        B_B = 2 if small else 16  # the video pipeline's default batch
        # K DISTINCT device-resident frame batches: a single perturbed input
        # lets XLA CSE the (identical) skew across chain steps and flatters
        # the number ~2x; distinct buffers measure the true per-batch cost
        # with no perturbation pass at all. Chained via a 384-byte palette
        # update for serialization / relay-dedup defeat.
        fs_bufs = [jnp.asarray(np.stack(
            [synth_image(H, W, 10 + 16 * j + i) for i in range(B_B)]))
            for j in range(3)]
        pal32_dev = jnp.asarray(pal32)
        fn = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                    int(pal32.shape[0]), B_B, interpret=cpu)

        def fs_many(k):
            @jax.jit
            def f(pal, *frames_list):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fn(frames_list[i],
                             pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                    # Full-sum consumption: a single-element read would let
                    # XLA slice away the (non-Pallas) epilogue stages.
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal32_dev, *fs_bufs[:k])

        # rounds=5: the r03 driver capture recorded planar at 844 fps vs two
        # same-day 1030+ readings — single-window medians through the relay
        # can be that noisy, and config 2/2p feed the planar-vs-NHWC
        # auto-select decision, so buy tighter medians here.
        per2 = timed_pair(fs_many(1), fs_many(3), 3, rounds=5)
        fs_fps = B_B / per2
        details["fs_1080p_kmeans32_fps_e2e_device"] = round(fs_fps, 1)
        log(f"2: FS 1080p kmeans-32 full path {per2*1e3:.1f} ms/batch{B_B} "
            f"-> {fs_fps:.0f} fps")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config2"] = repr(e)

    # Early emission: a parseable record exists from here on even if the
    # driver's window expires mid-run (VERDICT r04 #1).
    emit_result(partial=True)

    try:
        _config1()
    except _SkipBench:
        pass
    except Exception as e:
        errors["config1"] = repr(e)

    # Config 2b: 256-color palette through the packed lane-search kernel
    # (the reference supports arbitrary custom palettes; lospec palettes
    # routinely exceed 64 colors). Same chain harness, same frames.
    pal256_dev = fn256 = None
    per2b = None
    try:
        _gate("2b")
        prng = np.random.RandomState(42)
        pal256 = np.unique(prng.randint(0, 256, (600, 3)),
                           axis=0)[:256].astype(np.float32)
        pal256_dev = jnp.asarray(pal256)
        fn256 = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                       int(pal256.shape[0]), B_B,
                                       interpret=cpu)

        def fs256_many(k):
            @jax.jit
            def f(pal, *frames_list):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fn256(frames_list[i],
                                pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal256_dev, *fs_bufs[:k])

        per2b = timed_pair(fs256_many(1), fs256_many(3), 3)
        details["fs_1080p_pal256_fps_e2e_device"] = round(B_B / per2b, 1)
        log(f"2b: FS 1080p 256-color palette {per2b*1e3:.1f} ms/batch{B_B} "
            f"-> {B_B / per2b:.0f} fps")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config2b"] = repr(e)
    # (The slow dense cells — 2b-512, 2b-1024, 2b-mxu — run LAST, behind
    # the time budget: they are what pushed the r04 driver capture past
    # its window. See the "dense" section after the fidelity gate.)

    # Config 2p: planar-in/planar-out device path (the ffmpeg-gbrp
    # ingestion layout): the NHWC<->planar copies around the kernels
    # vanish — this measures what that buys vs the config-2 number.
    try:
        _gate("2p")
        pl_bufs = [jnp.asarray(np.ascontiguousarray(
            np.asarray(b_).transpose(3, 0, 1, 2))) for b_ in fs_bufs]
        fnp = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                     int(pal32.shape[0]), B_B,
                                     interpret=cpu, planar=True)

        def fsp_many(k):
            @jax.jit
            def f(pal, *planes_list):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fnp(planes_list[i],
                              pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal32_dev, *pl_bufs[:k])

        per2p = timed_pair(fsp_many(1), fsp_many(3), 3, rounds=5)
        details["fs_1080p_planar_fps_e2e_device"] = round(B_B / per2p, 1)
        if fs_fps:
            details["planar_vs_nhwc_ratio"] = round((B_B / per2p) / fs_fps, 3)
        log(f"2p: FS 1080p planar path {per2p*1e3:.1f} ms/batch{B_B} "
            f"-> {B_B / per2p:.0f} fps "
            f"(vs {fs_fps:.0f} NHWC)")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config2p"] = repr(e)

    # ---- Config 3: batch 100 x 1080p, blue-noise + IGN, pico8 palette -----
    try:
        _gate("3")
        # Differential in the BATCH dimension: time one batch-100 dispatch
        # vs one batch-4 dispatch — relay overhead cancels, every step pays
        # the full input prep. (Historical note: multi-call chain programs
        # with several 600 MB u8 params used to trip an XLA layout pathology
        # and OOM; the current jax/libtpu no longer reproduces it in any
        # form — tools/xla_layout_repro.py --chain, verified on v5e
        # 2026-08-18 — but the differential stays: it cancels relay
        # per-dispatch overhead, which a chain does not.)
        B_C, B_S = (4, 2) if small else (100, 4)
        frames_big = jnp.asarray(np.stack(
            [synth_image(H, W, 100 + i) for i in range(B_C)]))
        frames_small = jnp.asarray(np.asarray(frames_big[:B_S]))
        pico8 = PaletteManager().get_palette_colors_rgb("pico8_palette")
        pal_c = jnp.asarray(np.asarray(pico8, np.float32)) \
            if pico8 and len(pico8) == 16 else palette16
        bn_screen = tile_screen_device(jnp.asarray(blue_noise_cached(64, 42)), H, W)
        ign_screen = jnp.asarray(
            np.asarray(ign_thresholds(H, W, 1.0, 42), np.float32))

        def ordered_one(frames):
            @jax.jit
            def f(frames, pal, screen):
                out = ordered_dither_fused(frames, pal, screen,
                                           interpret=cpu, bucket=False)
                return out[0, 0, 0, 0] + out[-1, -1, -1, -1]
            return f

        def diff_batch(screen):
            fb, fs = ordered_one(frames_big), ordered_one(frames_small)
            f1 = lambda: fs(frames_small, pal_c, screen)
            fk = lambda: fb(frames_big, pal_c, screen)
            # Batch-size differential, median of 3 rounds (s/frame).
            return timed_pair(f1, fk, B_C - B_S + 1)

        per_bn = diff_batch(bn_screen)
        bn_gpix = mpix / per_bn / 1000.0
        per_ign = diff_batch(ign_screen)  # same programs, new screen input
        ign_gpix = mpix / per_ign / 1000.0
        details["bluenoise_100x1080p_gpix_s"] = round(bn_gpix, 3)
        details["ign_100x1080p_gpix_s"] = round(ign_gpix, 3)
        log(f"3: batch {B_C} blue-noise {bn_gpix:.2f} GPix/s, "
            f"IGN {ign_gpix:.2f} GPix/s")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config3"] = repr(e)

    # Also keep the round-1 comparable Bayer batch-8 throughput number.
    try:
        _gate("A")
        B_A = 2 if small else 8
        frames_a = [jnp.asarray(np.stack(
            [synth_image(H, W, 200 + B_A * j + i) for i in range(B_A)]))
            for j in range(3)]
        screen_a = tile_screen_device(jnp.asarray(bayer_matrix("8x8")), H, W)

        def bayer_many(k):
            @jax.jit
            def f(palette, screen, *frames_list):
                acc = jnp.zeros((), jnp.float32)
                for i in range(k):
                    out = ordered_dither_fused(
                        frames_list[i],
                        palette.at[0, 0].set(acc + jnp.float32(i % 3)),
                        screen, interpret=cpu, bucket=False)
                    acc = out[0, 0, 0, 0].astype(jnp.float32) * jnp.float32(1e-8)
                return acc
            return lambda: f(palette16, screen_a, *frames_a[:k])

        per_a = timed_pair(bayer_many(1), bayer_many(3), 3)
        bayer_gpix = B_A * mpix / per_a / 1000.0
        details["bayer8x8_1080p_gpix_per_s"] = round(bayer_gpix, 3)
        details["bayer_vs_1gpix_target"] = round(bayer_gpix, 3)
        log(f"A: bayer8x8 1080p x{B_A}: {bayer_gpix:.2f} GPix/s")
    except _SkipBench:
        pass
    except Exception as e:
        errors["bayer_batch"] = repr(e)

    # ---- Link bandwidth (context for the e2e numbers) ---------------------
    try:
        _gate("link")
        nbytes = 8 * 1024 * 1024 if not small else 1024 * 1024
        x = jnp.asarray(np.zeros(nbytes, np.uint8))
        x.block_until_ready()
        t0 = time.time(); _ = np.asarray(x); d2h = nbytes / (time.time() - t0) / 1e6
        y = np.zeros(nbytes, np.uint8)
        t0 = time.time(); z = jnp.asarray(y); z.block_until_ready()
        h2d = nbytes / (time.time() - t0) / 1e6
        details["link_h2d_mb_s"] = round(h2d, 1)
        details["link_d2h_mb_s"] = round(d2h, 1)
        from dither_pie_tpu.api.linkspeed import (d2h_bandwidth_mb_s,
                                                  index_transfer_wins)

        bw = d2h_bandwidth_mb_s()
        details["index_transfer_auto"] = bool(index_transfer_wins())
        details["index_transfer_probe_mb_s"] = (round(bw, 1)
                                                if bw is not None else None)
        log(f"link: H2D {h2d:.1f} MB/s, D2H {d2h:.1f} MB/s; index transfer "
            f"auto={details['index_transfer_auto']}")
    except _SkipBench:
        pass
    except Exception as e:
        errors["link"] = repr(e)

    # ---- Config 4: 720p/30 Stucki video END-TO-END ------------------------
    try:
        _gate("4")
        import tempfile
        from dither_pie_tpu.pipeline import ffio
        from dither_pie_tpu.pipeline.video import VideoProcessor
        from dither_pie_tpu.api.ditherer import (ColorReducer, DitherMode,
                                                 ImageDitherer)
        from PIL import Image

        if not ffio.video_available():
            raise RuntimeError("no video backend (ffmpeg/cv2)")
        vh, vw = (96, 128) if small else (720, 1280)
        n_frames = 8 if small else 32
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "src.mp4")
            dst = os.path.join(td, "out.mp4")
            writer = ffio.FrameWriter(src, vw, vh, 30.0)
            base = synth_image(vh, vw, 40)
            for i in range(n_frames):
                writer.write(np.roll(base, 3 * i, axis=1))
            writer.close()

            first = ffio.read_single_frame(src, 0)
            pal = ColorReducer.generate_kmeans_palette(
                Image.fromarray(first), 16)
            ditherer = ImageDitherer(
                num_colors=16, dither_mode=DitherMode.ERROR_DIFFUSION,
                palette=pal, dither_params={"variant": "stucki",
                                            "serpentine": "false"})
            vp = VideoProcessor(batch_size=16)
            from dither_pie_tpu.pipeline import video as _vid

            def timed_run(dst_i, overlap=True, index=None):
                """One e2e run; ``index`` forces the output-transfer mode."""
                if index is not None:
                    os.environ["DITHER_PIE_TPU_INDEX_TRANSFER"] = index
                try:
                    t0 = time.time()
                    if overlap:
                        ok_i = vp.process_video_streaming(src, dst_i, ditherer)
                    else:
                        reader = ffio.read_frames(src, vw, vh)
                        w2 = None
                        for outf in _vid.process_frames(reader, ditherer,
                                                        batch_size=16,
                                                        overlap=False):
                            if w2 is None:
                                w2 = ffio.FrameWriter(dst_i, outf.shape[1],
                                                      outf.shape[0], 30.0)
                            w2.write(outf)
                        ok_i = w2 is not None and w2.close()
                    wall_i = time.time() - t0
                finally:
                    if index is not None:
                        del os.environ["DITHER_PIE_TPU_INDEX_TRANSFER"]
                if not ok_i or not os.path.exists(dst_i):
                    raise RuntimeError(f"video pipeline failed ({dst_i})")
                return wall_i

            # Warm-up run first: program load/first-dispatch costs would
            # otherwise contaminate whichever variant runs first (observed:
            # a cold main run measured 4x slower than its own warm
            # identical-config rerun through the relay).
            timed_run(os.path.join(td, "warm.mp4"))

            wall = timed_run(dst)
            e2e_fps = n_frames / wall
            details["stucki_720p_video_e2e_fps_wall"] = round(e2e_fps, 2)
            details["stucki_720p_video_frames"] = n_frames
            log(f"4: 720p stucki video e2e {e2e_fps:.2f} fps wall "
                f"({n_frames} frames, {wall:.1f}s; tunnel-bound — see "
                f"link_d2h_mb_s)")

            # Overlap off (warm): what the double-buffered dispatch buys
            # on this host link.
            wall_ser = timed_run(os.path.join(td, "out_serial.mp4"),
                                 overlap=False)
            details["stucki_720p_video_e2e_fps_wall_no_overlap"] = round(
                n_frames / wall_ser, 2)
            details["video_overlap_speedup"] = round(wall_ser / wall, 2)
            log(f"4o: overlap off {n_frames / wall_ser:.2f} fps wall "
                f"(overlap buys {wall_ser / wall:.2f}x)")

            # Index stream forced ON vs OFF, both warm (the main run above
            # uses the auto probe's pick): a symmetric differential of the
            # 1-byte index + host-gather output against 3-byte RGB.
            timed_run(os.path.join(td, "warm_idx.mp4"), index="1")
            wall_idx = timed_run(os.path.join(td, "out_idx.mp4"), index="1")
            wall_rgb = timed_run(os.path.join(td, "out_rgb.mp4"), index="0")
            details["stucki_720p_video_e2e_fps_wall_index_on"] = round(
                n_frames / wall_idx, 2)
            details["stucki_720p_video_e2e_fps_wall_rgb_out"] = round(
                n_frames / wall_rgb, 2)
            details["video_index_transfer_speedup"] = round(
                wall_rgb / wall_idx, 2)
            log(f"4i: index stream {n_frames / wall_idx:.2f} vs rgb "
                f"{n_frames / wall_rgb:.2f} fps wall (index buys "
                f"{wall_rgb / wall_idx:.2f}x on this link)")

            # Bit-pack differential (VERDICT r04 #4): the 16-color palette
            # packs 2 px/byte on device (ops/idxpack.py), halving the
            # dominant D2H term. Same kernel program (the pack is a
            # separate jitted epilogue), so no extra warm-up run needed —
            # wall_idx above already ran with the pack ON (the default).
            os.environ["DITHER_PIE_TPU_INDEX_PACK"] = "0"
            try:
                wall_nopack = timed_run(
                    os.path.join(td, "out_idx_nopack.mp4"), index="1")
            finally:
                os.environ.pop("DITHER_PIE_TPU_INDEX_PACK", None)
            details["stucki_720p_video_e2e_fps_wall_index_nopack"] = round(
                n_frames / wall_nopack, 2)
            details["video_index_pack_speedup"] = round(
                wall_nopack / wall_idx, 2)
            log(f"4p: index pack on {n_frames / wall_idx:.2f} vs off "
                f"{n_frames / wall_nopack:.2f} fps wall (pack buys "
                f"{wall_nopack / wall_idx:.2f}x on this link)")

            # 4t: isolated index-move differential. The e2e wall above can
            # hide the D2H term entirely (overlap + host encode), so also
            # record the raw move: plain (B,H,W) u8 D2H vs the full packed
            # path (device pack -> half the bytes across the link -> host
            # unpack). This is the term the pack actually halves.
            import jax as _jax
            import jax.numpy as _jnp

            from dither_pie_tpu.ops.idxpack import (pack_indices_device,
                                                    unpack_indices_host)

            # Indices must be generated ON DEVICE with a fresh buffer per
            # measurement: device_put keeps a cached host copy, and
            # np.asarray on it reads back at memcpy speed, not link speed
            # (the round-3 293 GB/s link-probe trap).
            @_jax.jit
            def _make_idx(salt):
                i = _jnp.arange(16 * vh * vw, dtype=_jnp.uint32
                                ).reshape(16, vh, vw)
                return ((i * _jnp.uint32(2654435761) + salt)
                        >> _jnp.uint32(8)).astype(_jnp.uint8) & _jnp.uint8(15)

            def _move_plain(salt):
                a = _make_idx(_jnp.uint32(salt))
                a.block_until_ready()
                t0 = time.time()
                np.asarray(a)
                return time.time() - t0

            def _move_packed(salt):
                a = _make_idx(_jnp.uint32(salt))
                a.block_until_ready()
                t0 = time.time()
                packed = np.asarray(pack_indices_device(a, 4))
                unpack_indices_host(packed, 4, vw)
                return time.time() - t0

            _move_packed(0)  # compile pack epilogue + warm the path
            _move_plain(1)
            t_plain = sorted(_move_plain(2 + i) for i in range(3))[1]
            t_pack = sorted(_move_packed(16 + i) for i in range(3))[1]
            mb = 16 * vh * vw / 1e6
            details["index_move_plain_mb_s"] = round(mb / t_plain, 1)
            details["index_move_packed_mb_s"] = round(mb / t_pack, 1)
            details["index_move_pack_speedup"] = round(t_plain / t_pack, 2)
            log(f"4t: raw index move {mb / t_plain:.1f} MB/s plain vs "
                f"{mb / t_pack:.1f} MB/s effective packed (pack moves the "
                f"bare transfer {t_plain / t_pack:.2f}x)")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config4"] = repr(e)

    # Config 4b: device-sustained Stucki at 720p (what the chip does when
    # frames live on device, i.e. a production host link).
    try:
        _gate("4b")
        from dither_pie_tpu.ops import wavefront as wf

        vh, vw = (96, 128) if small else (720, 1280)
        B_D = 2 if small else 8
        st_bufs = [jnp.asarray(np.stack(
            [synth_image(vh, vw, 300 + 8 * j + i) for i in range(B_D)]))
            for j in range(3)]
        pal16 = jnp.asarray(np.asarray(
            ColorReducer.generate_kmeans_palette(
                Image.fromarray(synth_image(vh, vw, 40)), 16), np.float32))
        fn4 = wf.wavefront_device_fn("fixed", "stucki", vh, vw,
                                     int(pal16.shape[0]), B_D, interpret=cpu)

        def st_many(k):
            @jax.jit
            def f(pal, *frames_list):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fn4(frames_list[i],
                              pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal16, *st_bufs[:k])

        per4 = timed_pair(st_many(1), st_many(3), 3)
        details["stucki_720p_device_fps"] = round(B_D / per4, 1)
        log(f"4b: stucki 720p device-sustained {B_D/per4:.0f} fps")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config4b"] = repr(e)

    # ---- On-chip fidelity spot-check vs the C++ golden engine -------------
    try:
        _gate("fidelity", budget=False)
        from dither_pie_tpu.ops import ed_host
        from dither_pie_tpu.ops import wavefront as wf
        from dither_pie_tpu.core.fidelity import identity_fraction

        pal4 = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0],
                         [0, 128, 255]], np.float32)
        im = np.random.RandomState(1).randint(
            0, 256, (32, 40, 3)).astype(np.float32)
        fid = {}
        # Every fixed variant (all 8), the per-pixel-weight/aux modes, and
        # the 256-color lane-search path. tools/identity_sweep.py measures
        # the same cells at 480p-1080p scale; this is the per-run gate.
        # Golden = the f32-lookup engine, the kernel's bit-for-bit
        # contract (the same semantics family as the reference's Numba
        # paths where those exist — fixed + ostromoukhov; the reference's
        # Numba hybrid keeps f64 intermediates and perceptual/adaptive
        # have no Numba path, so for those the f32 contract is this
        # framework's choice, bounded by the >=0.95 perceptual parity
        # tests). The f64-exact engine legitimately flips exact half-way
        # palette ties, which u8 content can reach — see
        # tools/identity_sweep.py.
        for variant in ("floyd_steinberg", "jjn", "stucki", "burkes",
                        "atkinson", "sierra", "sierra_two_row",
                        "sierra_lite"):
            o = wf.ed_fixed_wavefront(im.copy(), pal4, variant)
            fid[variant] = round(identity_fraction(
                o, ed_host.ed_fixed_fast(im.copy(), pal4, variant,
                                         False)), 4)
        o = wf.ed_ostromoukhov_wavefront(im.copy(), pal4)
        fid["ostromoukhov"] = round(identity_fraction(
            o, ed_host.ed_ostromoukhov_fast(im.copy(), pal4, False)), 4)
        o = wf.ed_hybrid_wavefront(im.copy(), pal4, 1.0, 0.2)
        fid["hybrid"] = round(identity_fraction(
            o, ed_host.ed_hybrid_fast(im.copy(), pal4, 1.0, 0.2, True)), 4)
        o = wf.ed_perceptual_wavefront(im.copy(), pal4)
        fid["perceptual"] = round(identity_fraction(
            o, ed_host.ed_perceptual_fast(im.copy(), pal4)), 4)
        from dither_pie_tpu.ops.adaptive import variance_map_np

        gray = (np.float32(0.299) * im[..., 0] + np.float32(0.587) * im[..., 1]
                + np.float32(0.114) * im[..., 2])
        gate = (variance_map_np(gray, 1) >= 300.0)
        o = wf.ed_adaptive_wavefront(im.copy(), pal4, gate)
        fid["adaptive"] = round(identity_fraction(
            o, ed_host.ed_adaptive_fast(im.copy(), pal4, gate)), 4)
        prng = np.random.RandomState(7)
        p256 = np.unique(prng.randint(0, 256, (600, 3)),
                         axis=0)[:256].astype(np.float32)
        # Dense palettes gate against the f32 golden (the kernel's exact
        # semantics; the f64 engine differs on genuine f32 near-ties —
        # see tools/identity_sweep.py).
        o = wf.ed_fixed_wavefront(im.copy(), p256, "floyd_steinberg")
        fid["fs_pal256"] = round(identity_fraction(
            o, ed_host.ed_fixed_fast(im.copy(), p256, "floyd_steinberg",
                                     False)), 4)
        details["golden_bit_identity"] = fid
        if cpu:
            # XLA:CPU contracts a*b+c into FMA and nothing at the jax
            # level blocks it (measured, ROADMAP r04 item 7): the
            # bit-for-bit contract holds on TPU; CPU cells are perceptual
            # (pinned >=0.95 by tests/test_fidelity.py on this backend).
            details["golden_bit_identity_note"] = (
                "XLA:CPU FMA contraction makes sub-1.0 cells expected "
                "here; the bit contract is a TPU guarantee")
        bad = {k: v for k, v in fid.items() if v < 1.0}
        log(f"fidelity vs golden engine: "
            f"{'all 1.0 (' + str(len(fid)) + ' cells)' if not bad else bad}")
    except _SkipBench:
        pass
    except Exception as e:
        errors["fidelity"] = repr(e)

    # Re-emit with fidelity folded in: config 5/6 are the longest
    # budget-exposed sections, and a driver kill mid-config-5 must not
    # cost the fidelity record (the fidelity gate itself is exempt and
    # cheap, so it runs BEFORE them).
    emit_result(partial=True)

    # ---- Config 5: 1080p neural pixelization + hybrid dither --------------
    try:
        _gate("5")
        from dither_pie_tpu.models.inference import PixelizationModel
        from dither_pie_tpu.models.pixelizer import NeuralPixelizer
        from dither_pie_tpu.pipeline import pixelize as pixmod
        from dither_pie_tpu.pipeline.video import process_frames
        from dither_pie_tpu.api.ditherer import (ColorReducer, DitherMode,
                                                 ImageDitherer)
        from PIL import Image

        model = PixelizationModel()
        model.load_random(0)
        npix = NeuralPixelizer.__new__(NeuralPixelizer)
        npix._model = model
        pixmod._neural_singleton = npix

        nh, nw = (96, 128) if small else (1080, 1920)
        n5 = 4 if small else 8
        max_size = 32 if small else 128
        src_frames = [synth_image(nh, nw, 500 + i) for i in range(n5)]
        pal5 = ColorReducer.generate_kmeans_palette(
            Image.fromarray(np.array(
                npix.pixelize(Image.fromarray(src_frames[0]), max_size)
                .convert("RGB"))), 32)
        d5 = ImageDitherer(num_colors=32, dither_mode=DitherMode.HYBRID,
                           palette=pal5)
        # warm-up (compiles + the one-time bf16 parity gate, which runs
        # BOTH precisions on the first batch)
        _ = list(process_frames(iter(src_frames[:n5]), d5,
                                pixelize_func=("neural", max_size),
                                batch_size=n5, prefetch=False))
        # Best of 2 warm reps: single e2e runs through the relay carry
        # multi-second per-dispatch jitter.
        wall = float("inf")
        for _rep in range(2):
            t0 = time.time()
            outs = list(process_frames(iter(src_frames), d5,
                                       pixelize_func=("neural", max_size),
                                       batch_size=n5, prefetch=False))
            wall = min(wall, time.time() - t0)
            assert len(outs) == n5
        details["neural_hybrid_1080p_fps_wall"] = round(n5 / wall, 2)
        details["neural_hybrid_note"] = ("random weights (checkpoints not in "
                                         "image); batched device forward")
        log(f"5: neural+hybrid 1080p {n5/wall:.2f} fps wall (batch {n5})")

        # ds4 on/off differential: the default path ships only the /4 block
        # samples (the output is 4x4-block-constant; 16x less D2H — the
        # bit-identity is tested in tests/test_neural.py). The wall number
        # above ran with ds4 ON (the default); measure OFF for the diff.
        os.environ["DITHER_PIE_TPU_NEURAL_DS4"] = "0"
        try:
            wall_full = float("inf")
            for _rep in range(2):
                t0 = time.time()
                outs = list(process_frames(iter(src_frames), d5,
                                           pixelize_func=("neural", max_size),
                                           batch_size=n5, prefetch=False))
                wall_full = min(wall_full, time.time() - t0)
                assert len(outs) == n5
        finally:
            os.environ.pop("DITHER_PIE_TPU_NEURAL_DS4", None)
        details["neural_hybrid_1080p_fps_wall_ds4_off"] = round(
            n5 / wall_full, 2)
        details["neural_ds4_speedup"] = round(wall_full / wall, 2)
        # Round-5 strided final conv: record what the first-batch gate
        # decided for this capture (True = 16x fewer final-conv windows).
        details["neural_ds4_stride_locked"] = getattr(
            model, "_ds4_stride", None)
        log(f"5d: ds4 off {n5/wall_full:.2f} fps wall "
            f"(ds4 transfer buys {wall_full/wall:.2f}x)")

        # Device-sustained batched forward (the wall number above is
        # dominated by tunnel transfer + host PIL resizes).
        from dither_pie_tpu.models.inference import process, resize_image_nearest

        pre = np.concatenate(
            [process(resize_image_nearest(
                Image.fromarray(f).convert("RGB"), max_size * 4))
             for f in src_frames], axis=0)
        bufs5 = [jnp.asarray(pre + np.float32(0.001 * j)) for j in range(3)]
        gp = {k: jnp.asarray(v) for k, v in model.gen_params.items()}
        ap = {k: jnp.asarray(v) for k, v in model.alias_params.items()}
        from dither_pie_tpu.models.inference import _forward_u8

        def nn_many(k, precision="float32"):
            @jax.jit
            def f(gp, ap, ref, *xs):
                acc = jnp.float32(0)
                for i in range(k):
                    out = _forward_u8(gp, ap, xs[i] + acc, ref,
                                      precision=precision)
                    acc = out[0, 0, 0, 0].astype(jnp.float32) * jnp.float32(1e-9)
                return acc
            return lambda: f(gp, ap, model.ref_t, *bufs5[:k])

        per5 = timed_pair(nn_many(1), nn_many(3), 3)
        details["neural_forward_device_fps"] = round(n5 / per5, 1)
        log(f"5b: neural forward device-sustained {n5/per5:.1f} fps "
            f"(batch {n5} at {pre.shape[1]}x{pre.shape[2]})")

        # bf16 fast mode (DITHER_PIE_TPU_NEURAL_PRECISION=bfloat16): MXU
        # native rate, f32 accumulation; report speed + output delta vs f32.
        per5b = timed_pair(nn_many(1, "bfloat16"), nn_many(3, "bfloat16"), 3)
        o32 = np.asarray(_forward_u8(gp, ap, bufs5[0], model.ref_t))
        o16 = np.asarray(_forward_u8(gp, ap, bufs5[0], model.ref_t,
                                     precision="bfloat16"))
        delta = float(np.mean(np.abs(o32.astype(np.int16)
                                     - o16.astype(np.int16))))
        details["neural_forward_bf16_fps"] = round(n5 / per5b, 1)
        details["neural_forward_bf16_mean_u8_delta"] = round(delta, 3)
        log(f"5c: neural forward bf16 {n5/per5b:.1f} fps "
            f"(mean |u8 delta| vs f32: {delta:.3f})")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config5"] = repr(e)

    # ---- Config 6: Riemersma host-vs-device A/B (VERDICT r03 item 5) ------
    # The on-device lax.scan exists and is bit-identical on TPU; this
    # records the measured decision (host C++ wins) in every bench capture.
    try:
        _gate("6")
        from dither_pie_tpu.ops import ed_host
        from dither_pie_tpu.ops.riemersma_scan import riemersma_scan_batch

        rh, rw, rb = (48, 64, 2) if small else (240, 320, 4)
        r_imgs = np.stack([synth_image(rh, rw, 600 + i)
                           for i in range(rb)]).astype(np.float32)
        r_pal = np.unique(np.random.RandomState(3).randint(
            0, 256, (40, 3)), axis=0)[:16].astype(np.float32)
        # Identity comes from the warm-up output; the TIMED dispatch is
        # salted (one pixel) — the relay dedupes byte-identical dispatches
        # and would serve a repeat from its cache (~0 ms), not the kernel.
        dev_out = riemersma_scan_batch(r_imgs.copy(), r_pal)  # compile+run
        r_salt = r_imgs.copy()
        r_salt[0, 0, 0, 0] = np.float32((r_salt[0, 0, 0, 0] + 1.0) % 256.0)
        t0 = time.time()
        _ = riemersma_scan_batch(r_salt, r_pal)
        dev_s = time.time() - t0
        t0 = time.time()
        host_ref = [ed_host.ed_riemersma_fast(r_imgs[i].copy(), r_pal)
                    for i in range(rb)]
        host_s = time.time() - t0
        from dither_pie_tpu.core.fidelity import identity_fraction

        r_ident = min(identity_fraction(dev_out[i],
                                        host_ref[i].astype(np.uint8))
                      for i in range(rb))
        details["riemersma_240p_device_fps"] = round(rb / dev_s, 2)
        details["riemersma_240p_host_fps"] = round(rb / host_s, 2)
        details["riemersma_device_vs_host"] = round(host_s / dev_s, 3)
        details["riemersma_device_identity"] = round(r_ident, 4)
        log(f"6: riemersma {rh}p A/B: device {rb/dev_s:.2f} fps vs host "
            f"C++ {rb/host_s:.2f} fps ({host_s/dev_s:.2f}x; identity "
            f"{r_ident}) -> host stays the default")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config6"] = repr(e)

    # ---- Dense-palette scaling cells (slow; budget-gated, LAST) -----------
    # P=512/1024 rows + the MXU-search A/B: each needs fresh chained-program
    # compiles through the relay (minutes). These are exactly the cells that
    # pushed the r04 driver run past its window, so they run after
    # everything else and only while the budget allows.
    try:
        _gate("dense")
        if fn256 is None:
            raise RuntimeError("config 2b did not run (dense cells reuse "
                               "its buffers)")
        prng_d = np.random.RandomState(43)
        for pn in (512, 1024):
            _gate("dense")  # re-check the budget between cells
            paln = np.unique(prng_d.randint(0, 256, (pn * 3, 3)),
                             axis=0)[:pn].astype(np.float32)
            paln_dev = jnp.asarray(paln)
            fnn = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                         int(paln.shape[0]), B_B,
                                         interpret=cpu)

            def fsn_many(k, fnn=fnn, paln_dev=paln_dev):
                @jax.jit
                def f(pal, *frames_list):
                    acc = jnp.float32(0)
                    for i in range(k):
                        out = fnn(frames_list[i],
                                  pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                        acc = (jnp.sum(out.astype(jnp.int32))
                               .astype(jnp.float32) * jnp.float32(1e-12))
                    return acc
                return lambda: f(paln_dev, *fs_bufs[:k])

            pern = timed_pair(fsn_many(1), fsn_many(3), 3)
            details[f"fs_1080p_pal{pn}_fps_e2e_device"] = round(B_B / pern, 1)
            log(f"2b-{pn}: FS 1080p {pn}-color palette "
                f"{pern*1e3:.1f} ms/batch{B_B} -> {B_B / pern:.0f} fps")

        # 2b-mxu: the MXU-scored dense search (opt-in knob). Same chain
        # harness; also record the pick-flip fraction vs the exact kernel
        # (device-side compare, one scalar off the chip).
        _gate("dense")
        fn256m = wf.wavefront_device_fn("fixed", "floyd_steinberg", H, W,
                                        256, B_B,
                                        interpret=cpu, dense_search="mxu")

        def fs256m_many(k):
            @jax.jit
            def f(pal, *frames_list):
                acc = jnp.float32(0)
                for i in range(k):
                    out = fn256m(frames_list[i],
                                 pal.at[0, 0].set(acc + jnp.float32(i % 3)))
                    acc = (jnp.sum(out.astype(jnp.int32)).astype(jnp.float32)
                           * jnp.float32(1e-12))
                return acc
            return lambda: f(pal256_dev, *fs_bufs[:k])

        per2bm = timed_pair(fs256m_many(1), fs256m_many(3), 3)
        details["fs_1080p_pal256_mxu_fps_e2e_device"] = round(B_B / per2bm, 1)

        @jax.jit
        def flipfrac(pal, frames):
            a = fn256(frames, pal)
            m = fn256m(frames, pal)
            return jnp.mean(jnp.any(a != m, axis=-1).astype(jnp.float32))

        details["fs_1080p_pal256_mxu_flip_fraction"] = round(
            float(flipfrac(pal256_dev, fs_bufs[0])), 6)
        ratio = f"{per2b / per2bm:.2f}x exact; " if per2b else ""
        log(f"2bm: FS 1080p 256-color MXU search {per2bm*1e3:.1f} ms/batch"
            f"{B_B} -> {B_B / per2bm:.0f} fps "
            f"({ratio}flip fraction "
            f"{details['fs_1080p_pal256_mxu_flip_fraction']})")
    except _SkipBench:
        pass
    except Exception as e:
        errors["config_dense"] = repr(e)

    # Close the last config's time attribution.
    cfg_times[_last_cfg["name"]] = round(
        cfg_times.get(_last_cfg["name"], 0.0)
        + time.time() - _last_cfg["t"], 1)
    details["config_times_s"] = cfg_times
    details["total_wall_s"] = round(time.time() - t_start, 1)
    details["time_budget_s"] = budget_s
    if budget_skipped:
        details["budget_skipped"] = sorted(set(budget_skipped))

    if errors:
        details["errors"] = errors

    try:
        # Smoke/dev invocations (BENCH_SMALL or a BENCH_CONFIGS subset)
        # report deltas but never persist: a BENCH_SMALL run's numbers are
        # shape-degenerate (observed: a 2-frame chain reading 2e9 fps via
        # relay dedup) and would poison the next real run's comparisons.
        moves = update_ledger(details, persist=not (small or only))
        if moves:
            details["ledger_moves_gt10pct"] = moves
    except Exception as e:
        log(f"ledger update failed: {e!r}")

    emit_result()


if __name__ == "__main__":
    main()
