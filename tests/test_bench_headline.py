"""The headline metric must be un-losable (VERDICT r3 #1: rounds 2 and 3
both lost their official record to rc=124 inside optional-rung
recomputes). These tests assert the structural fix: `python bench.py`
prints the parsed headline JSON immediately after the tpu32 worker, from
whatever cache is on disk — stale fingerprint, stale store bits, or no
cache at all — and the default path never launches the cpu/tpu64
workers."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


R32 = {
    "evals_per_sec": 200.0, "batch": 64, "rep_times": [0.32] * 5,
    "e_f32": -1.0, "f_f32": [0.0] * 21, "e_comp": -1.0,
    "md_steps_per_sec": 57.0, "store_md5": "aaaa",
}


def _patch_workers(monkeypatch, allowed=("tpu32",)):
    launched = []

    def fake_run_worker(name, timeout=7200):
        launched.append(name)
        assert name in allowed, \
            f"default bench run launched forbidden worker {name!r}"
        return dict(R32)

    monkeypatch.setattr(bench, "_run_worker", fake_run_worker)
    return launched


def _headline(capsys):
    cap = capsys.readouterr()
    out = cap.out.strip().splitlines()
    assert out, "no stdout at all"
    rec = json.loads(out[-1])
    assert rec["metric"] == "zundel84_pes_force_evals_per_sec"
    assert rec["value"] == pytest.approx(200.0)
    assert rec["unit"] == "evals/s"
    return rec, cap.err


def test_headline_with_poisoned_fingerprint(tmp_path, monkeypatch, capsys):
    """A stale cache (wrong fingerprint AND wrong store hash) must still
    yield the headline without recomputing anything."""
    cache = {
        "cpu": {"cpu_eval_seconds": 2.5, "energy": -1.0,
                "forces": [0.0] * 21, "store_md5": "bbbb"},
        "cpu_fingerprint": "poisoned", "cpu_store_md5": "bbbb",
        "cpu_date": "2026-01-01", "cpu_anchor_s": 2.5,
    }
    path = tmp_path / "cache.json"
    path.write_text(json.dumps(cache))
    monkeypatch.setattr(bench, "CACHE_PATH", str(path))
    launched = _patch_workers(monkeypatch)

    bench.main()
    rec, _ = _headline(capsys)
    assert rec["vs_baseline"] == pytest.approx(200.0 * 2.5)
    assert launched == ["tpu32"]


def test_headline_with_no_cache(tmp_path, monkeypatch, capsys):
    """No cache file at all: headline still prints, against the recorded
    fallback baseline."""
    monkeypatch.setattr(bench, "CACHE_PATH", str(tmp_path / "absent.json"))
    launched = _patch_workers(monkeypatch)

    bench.main()
    rec, _ = _headline(capsys)
    assert rec["vs_baseline"] == pytest.approx(
        200.0 * bench.FALLBACK_CPU_S)
    assert launched == ["tpu32"]


def test_stale_rung_not_laundered(tmp_path, monkeypatch, capsys):
    """ADVICE r3 (medium): serving a stale rung must keep it marked stale
    — _rung() classification is per-rung, derived from the rung's own
    recorded fingerprint, so refreshing one rung cannot bless another."""
    fp = bench._pipeline_fingerprint()
    cache = {
        "cpu": {"cpu_eval_seconds": 2.5, "energy": -1.0,
                "forces": [0.0] * 21, "store_md5": R32["store_md5"]},
        "cpu_fingerprint": "old", "cpu_store_md5": R32["store_md5"],
        "tpu64": {"e_precise": -1.0, "f_precise": [0.0] * 21,
                  "precise_evals_per_sec": 20.0, "precise_batch": 8,
                  "store_md5": R32["store_md5"]},
        "tpu64_fingerprint": fp, "tpu64_store_md5": R32["store_md5"],
    }
    path = tmp_path / "cache.json"
    path.write_text(json.dumps(cache))
    monkeypatch.setattr(bench, "CACHE_PATH", str(path))

    loaded = bench._migrate_cache(bench._cache_load())
    _, cpu_status = bench._rung(loaded, "cpu", fp, R32["store_md5"])
    _, t64_status = bench._rung(loaded, "tpu64", fp, R32["store_md5"])
    assert cpu_status == "stale"
    assert t64_status == "fresh"

    _patch_workers(monkeypatch)
    bench.main()
    _, err = _headline(capsys)
    assert "STALE" in err


def test_legacy_cache_schema_migrates(tmp_path, monkeypatch, capsys):
    """The committed round-3 cache uses the old single-fingerprint schema;
    it must be readable and classified correctly."""
    cache = {
        "fingerprint": "legacyfp", "store_md5": R32["store_md5"],
        "cpu": {"cpu_eval_seconds": 2.75, "energy": -1.0,
                "forces": [0.0] * 21, "store_md5": R32["store_md5"]},
        "cpu_date": "2026-08-20",
    }
    path = tmp_path / "cache.json"
    path.write_text(json.dumps(cache))
    monkeypatch.setattr(bench, "CACHE_PATH", str(path))
    loaded = bench._migrate_cache(bench._cache_load())
    _, status = bench._rung(loaded, "cpu", "legacyfp", R32["store_md5"])
    assert status == "fresh"
    _, status = bench._rung(loaded, "cpu", "otherfp", R32["store_md5"])
    assert status == "stale"

    _patch_workers(monkeypatch)
    bench.main()
    rec, _ = _headline(capsys)
    # no anchor recorded in the legacy schema: falls back to the live entry
    assert rec["vs_baseline"] == pytest.approx(200.0 * 2.75)
