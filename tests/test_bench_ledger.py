"""Regression-ledger unit tests (bench.py round-over-round tracking)."""

import json

import bench


def test_ledger_appends_and_flags_big_moves(tmp_path, monkeypatch):
    ledger = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "LEDGER_PATH", str(ledger))

    first = {"platform": "tpu", "bayer8x8_1080p_gpix_per_s": 2.0,
             "stucki_720p_device_fps": 1000.0}
    assert bench.update_ledger(first, label="run-a") == {}

    # -20% bayer (flagged), +2% stucki (not flagged).
    second = {"platform": "tpu", "bayer8x8_1080p_gpix_per_s": 1.6,
              "stucki_720p_device_fps": 1020.0}
    moves = bench.update_ledger(second, label="run-b")
    assert moves == {"bayer8x8_1080p_gpix_per_s": -20.0}

    entries = [json.loads(line) for line in ledger.read_text().splitlines()]
    assert [e["label"] for e in entries] == ["run-a", "run-b"]
    assert entries[1]["bayer8x8_1080p_gpix_per_s"] == 1.6


def test_ledger_compares_same_platform_only(tmp_path, monkeypatch):
    ledger = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "LEDGER_PATH", str(ledger))
    bench.update_ledger({"platform": "tpu",
                         "bayer8x8_1080p_gpix_per_s": 2.0}, label="tpu-run")
    # A CPU run must not diff against the TPU entry.
    moves = bench.update_ledger({"platform": "cpu",
                                 "bayer8x8_1080p_gpix_per_s": 0.1},
                                label="cpu-run")
    assert moves == {}


def test_ledger_dev_runs_report_but_never_persist(tmp_path, monkeypatch):
    """BENCH_SMALL / BENCH_CONFIGS invocations pass persist=False: their
    shape-degenerate numbers must not become the next real run's baseline
    (observed: a 2-frame smoke read 2e9 fps via relay dedup)."""
    ledger = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "LEDGER_PATH", str(ledger))
    bench.update_ledger({"platform": "tpu",
                         "bayer8x8_1080p_gpix_per_s": 2.0}, label="run-a")
    moves = bench.update_ledger({"platform": "tpu",
                                 "bayer8x8_1080p_gpix_per_s": 200.0},
                                label="dev-smoke", persist=False)
    assert moves == {"bayer8x8_1080p_gpix_per_s": 9900.0}  # still reported
    entries = [json.loads(line) for line in ledger.read_text().splitlines()]
    assert [e["label"] for e in entries] == ["run-a"]  # not persisted


def test_ledger_skips_empty_runs(tmp_path, monkeypatch):
    ledger = tmp_path / "ledger.jsonl"
    monkeypatch.setattr(bench, "LEDGER_PATH", str(ledger))
    bench.update_ledger({"platform": "tpu"}, label="nothing-measured")
    assert not ledger.exists()


def test_committed_ledger_is_valid_jsonl():
    import pathlib
    p = pathlib.Path(bench.LEDGER_PATH)
    assert p.exists()
    for line in p.read_text().splitlines():
        e = json.loads(line)
        assert "label" in e and "platform" in e
