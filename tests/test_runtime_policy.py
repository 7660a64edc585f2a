"""Backend-selection policy units: the wedge-probe CPU downgrade must not
override an explicit platform pin or DITHER_PIE_TPU_ACCEL_REQUIRED=1, and
the dryrun's medium-shape batch must always shard evenly."""

import pytest

from dither_pie_tpu.api.runtime import _downgrade_allowed


def test_downgrade_allowed_for_auto_and_relay_pin():
    # Unset/empty pin means "auto"; the relay accelerator's own platform
    # name is the thing the probe exists to guard — both may downgrade.
    assert _downgrade_allowed("", False)
    assert _downgrade_allowed(None, False)
    assert _downgrade_allowed("axon", False)


@pytest.mark.parametrize("pinned", ["tpu", "cuda", "cpu", "tpu,cpu"])
def test_downgrade_vetoed_by_explicit_platform_pin(pinned):
    # A pin to any platform besides the remote relay is user intent: a CI
    # gate pinned to JAX_PLATFORMS=tpu must fail loudly, not silently
    # record numbers on CPU.
    assert not _downgrade_allowed(pinned, False)


def test_downgrade_vetoed_by_accel_required():
    assert not _downgrade_allowed("", True)
    assert not _downgrade_allowed("axon", True)


def test_dryrun_medium_batch_shards_evenly():
    import __graft_entry__ as g

    for dp in range(1, 13):
        mb = g._medium_batch(dp)
        assert mb % dp == 0, (dp, mb)
        assert mb >= 16
        assert mb // dp >= 2
