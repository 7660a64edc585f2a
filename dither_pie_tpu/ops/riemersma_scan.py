"""On-device Riemersma dithering: a lax.scan over the Hilbert curve.

The reference's Riemersma strategy (/root/reference/dithering_lib.py:812-841)
diffuses error along a Hilbert curve with FS-style weights [7,1,5,3]/16
pushed to the next four curve positions — a 1-D sequential recurrence with
no 2-D wavefront. Round 1-3 ran it on the host C++ engine
(native/ed_scan.cpp ed_riemersma_f32). This module is the measured
alternative VERDICT r03 item 5 asked for: the same recurrence as a
``lax.scan`` over the curve with the palette search vectorized per step and
the BATCH dimension riding the VPU lanes — one scan quantizes B frames.

Exact semantics (bit-for-bit vs the C++ f32 twin ON TPU — hardware-verified
across shapes; XLA:CPU may flip rare near-ties through its uncontrollable
FMA contraction, see the precision note in _scan_fn):
  * raw curve covers the padded 2^k grid; off-image slots are skipped,
    but the "next 4" receiver window is over RAW slots (off-image
    receivers drop their share);
  * no clamp before the search (receivers are clamped at receive time);
  * palette search in f32, (dr*dr + dg*dg) + db*db, first-wins argmin;
  * each receiver add is clamped immediately (clip(q + e*w)).

The raw-window bookkeeping compresses exactly: valid positions keep curve
order, so a valid receiver at raw offset 1+k lands at compressed offset
d in [1, 4], and distinct k map to distinct d. Host-side we precompute, per
valid step, a (4,) weight row where entry d-1 carries fs[k] for the
receiver at compressed offset d (0 = no receiver), and the scan carries a
5-deep ring of future working values.
"""

from __future__ import annotations

import functools

import numpy as np

FS_WEIGHTS = (np.float32(7 / 16), np.float32(1 / 16),
              np.float32(5 / 16), np.float32(3 / 16))

# Unrolled steps per scan iteration: trades scan/loop overhead against
# program size. 8 measured best on v5e (see tools/riemersma_ab.py).
BLOCK = 8


@functools.lru_cache(maxsize=8)
def _path_maps(h: int, w: int):
    """(order_lin (N,) i32 curve-ordered linear pixel indices,
    wt (N, 4) f32 per-step compressed receiver weights)."""
    from dither_pie_tpu.ops.hilbert import hilbert_path, next_power_of_two

    dim = next_power_of_two(max(h, w))
    path = hilbert_path(dim)  # (n, 2) [row, col]
    valid = (path[:, 0] < h) & (path[:, 1] < w)
    order_lin = (path[valid, 0].astype(np.int64) * w
                 + path[valid, 1].astype(np.int64)).astype(np.int32)
    n_raw = path.shape[0]
    comp = np.cumsum(valid) - 1  # compressed index per raw slot (valid only)
    n = int(valid.sum())
    wt = np.zeros((n, 4), np.float32)
    vi = np.flatnonzero(valid)
    for k in range(4):
        j = vi + 1 + k
        ok = (j < n_raw)
        jj = j[ok]
        src = comp[vi[ok]]
        tgt_valid = valid[jj]
        d = comp[jj[tgt_valid]] - src[tgt_valid]  # in [1, 4]
        wt[src[tgt_valid], d - 1] = FS_WEIGHTS[k]
    return order_lin, wt


@functools.lru_cache(maxsize=16)
def _scan_fn(h: int, w: int, p: int, batch: int):
    import jax
    import jax.numpy as jnp

    n = int(_path_maps(h, w)[0].shape[0])
    n_pad = -(-n // BLOCK) * BLOCK

    def run(x_curve, pal):
        # x_curve (n_pad + 5, B, 3) f32 curve-ordered working values
        # (padded tail never contributes: its wt rows are zero and its
        # outputs are sliced away); pal (P, 3) f32.
        _, wt_np = _path_maps(h, w)
        wt = jnp.asarray(np.concatenate(
            [wt_np, np.zeros((n_pad - n, 4), np.float32)], axis=0))
        pal_r = pal[:, 0][:, None]  # (P, 1)
        pal_g = pal[:, 1][:, None]
        pal_b = pal[:, 2][:, None]
        p_iota = jnp.arange(p, dtype=jnp.int32)[:, None]  # (P, 1)

        # Precision note: the bit-contract with the C++ twin holds on the
        # TPU backend (verified on hardware across shapes and on the
        # adversarial content in tests/test_riemersma_scan.py). XLA:CPU's
        # emitter contracts a*b+c into FMA (measured: 12.7% of random
        # mul-then-add values differ in the last bit) and NOTHING at the
        # jax level blocks it — optimization_barrier, int32-bitcast
        # round-trips, and runtime-predicate selects were all elided, and
        # no xla_cpu_* flag disables contraction on this toolchain. On CPU
        # the scan is therefore near-exact: rare last-bit flips on
        # near-ties, bounded by the perceptual gates (the CPU path is a
        # test/debug surface; the product path runs the C++ engine there).
        def one(ring, wrow):
            old = ring[0]  # (B, 3)
            dr = pal_r - old[None, :, 0].reshape(1, batch)
            dg = pal_g - old[None, :, 1].reshape(1, batch)
            db = pal_b - old[None, :, 2].reshape(1, batch)
            d2 = (dr * dr + dg * dg) + db * db  # C++ twin association
            dmin = jnp.min(d2, axis=0, keepdims=True)
            idx = jnp.min(jnp.where(d2 == dmin, p_iota, p), axis=0)  # (B,)
            onehot = (p_iota == idx[None, :]).astype(jnp.float32)  # (P, B)
            chosen = jnp.stack([jnp.sum(pal_r * onehot, axis=0),
                                jnp.sum(pal_g * onehot, axis=0),
                                jnp.sum(pal_b * onehot, axis=0)],
                               axis=-1)  # (B, 3)
            err = old - chosen
            outs = []
            for d in range(1, 5):
                wd = wrow[d - 1]
                upd = jnp.clip(ring[d] + err * wd, 0.0, 255.0)
                outs.append(jnp.where(wd > 0, upd, ring[d]))
            return jnp.stack(outs), chosen

        def block_step(ring, xs):
            wrows, feeds = xs  # (BLOCK, 4), (BLOCK, B, 3)
            ys = []
            for t in range(BLOCK):
                ring4, chosen = one(ring, wrows[t])
                ring = jnp.concatenate([ring4, feeds[t][None]], axis=0)
                ys.append(chosen)
            return ring, jnp.stack(ys)

        ring0 = x_curve[0:5]
        feeds = x_curve[5:5 + n_pad]
        _, ys = jax.lax.scan(
            block_step, ring0,
            (wt.reshape(n_pad // BLOCK, BLOCK, 4),
             feeds.reshape(n_pad // BLOCK, BLOCK, batch, 3)))
        return ys.reshape(n_pad, batch, 3)[:n].astype(jnp.uint8)

    return jax.jit(run)


def riemersma_scan_batch(images: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) f32 -> (B, H, W, 3) uint8, bit-identical to
    ed_host.ed_riemersma_fast per frame (tested)."""
    import jax.numpy as jnp

    images = np.ascontiguousarray(images, np.float32)
    b, h, w, _ = images.shape
    pal = np.ascontiguousarray(palette, np.float32)
    order_lin, _ = _path_maps(h, w)
    n = order_lin.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    flat = images.reshape(b, h * w, 3)
    x_curve = np.zeros((n_pad + 5, b, 3), np.float32)
    x_curve[:n] = flat[:, order_lin].transpose(1, 0, 2)
    out_curve = np.asarray(_scan_fn(h, w, int(pal.shape[0]), b)(
        jnp.asarray(x_curve), jnp.asarray(pal)))  # (n, B, 3) u8
    out = np.empty((b, h * w, 3), np.uint8)
    out[:, order_lin] = out_curve.transpose(1, 0, 2)
    return out.reshape(b, h, w, 3)
