"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dither_pie_tpu.core.thresholds import bayer_matrix
from dither_pie_tpu.ops import ed_host
from dither_pie_tpu.ops.ordered import ordered_dither_batch, tile_screen_device
from dither_pie_tpu.parallel.mesh import make_mesh
from dither_pie_tpu.parallel.sharding import (make_sharded_ed_step,
                                              make_sharded_ordered_step,
                                              shard_frames)


@pytest.fixture(scope="module")
def mesh_4x2():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(shape=(4, 2))


def test_sharded_ordered_matches_single_device(mesh_4x2):
    rng = np.random.RandomState(0)
    b, h, w, p = 8, 32, 40, 8
    frames = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    palette = jnp.asarray(rng.randint(0, 256, (p, 3)).astype(np.float32))
    screen = tile_screen_device(jnp.asarray(bayer_matrix("4x4")), h, w)

    step = make_sharded_ordered_step(mesh_4x2, use_gamma=False)
    out, hist = step(shard_frames(mesh_4x2, frames), palette, screen)
    out = np.asarray(out)

    ref = np.asarray(ordered_dither_batch(
        jnp.asarray(frames, jnp.float32), palette, screen))
    np.testing.assert_array_equal(out, ref)
    assert int(np.asarray(hist).sum()) == b * h * w


def test_sharded_ordered_gamma_histogram(mesh_4x2):
    rng = np.random.RandomState(1)
    b, h, w = 8, 16, 32
    frames = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    palette = jnp.asarray(rng.randint(0, 256, (4, 3)).astype(np.float32))
    screen = tile_screen_device(jnp.asarray(bayer_matrix("2x2")), h, w)
    step = make_sharded_ordered_step(mesh_4x2, use_gamma=True)
    out, hist = step(shard_frames(mesh_4x2, frames), palette, screen)
    assert np.asarray(out).shape == frames.shape
    assert int(np.asarray(hist).sum()) == b * h * w


def test_sharded_ed_dp(mesh_4x2):
    """Each chip's wavefront result matches (near-identically) the native
    engine — the sharding adds no semantic change."""
    devices = jax.devices()[:4]
    mesh = make_mesh(shape=(4,), axis_names=("data",), devices=devices)
    rng = np.random.RandomState(2)
    h, w, p, bpc = 16, 20, 4, 2
    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 128, 255]],
                   np.float32)
    frames = rng.randint(0, 256, (4 * bpc, h, w, 3)).astype(np.uint8)
    run = make_sharded_ed_step(mesh, h, w, p, bpc)
    out, err = run(frames, pal)
    out = np.asarray(out)
    assert out.shape == frames.shape
    assert float(err) > 0
    from dither_pie_tpu.core.fidelity import assert_perceptually_matched

    from dither_pie_tpu.ops import wavefront as wf
    single = wf._run("fixed", frames.astype(np.float32).copy(), pal,
                     variant="floyd_steinberg")
    for i in range(len(frames)):
        # Sharding must add NO semantic change: bit-identical to the
        # single-chip packed kernel on the same frames.
        np.testing.assert_array_equal(out[i], single[i])
        # And perceptually matched to the golden engine (frame 3 contains a
        # genuine f32-vs-f64 near-tie; all other frames are bit-exact).
        native = ed_host.ed_fixed(frames[i].astype(np.float32).copy(), pal,
                                  "floyd_steinberg", False)
        assert_perceptually_matched(out[i].astype(np.uint8),
                                    native.astype(np.uint8),
                                    min_identical=0.95)


@pytest.mark.slow
def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 256, 3) and out.dtype == np.uint8
    g.dryrun_multichip(min(8, len(jax.devices())))
