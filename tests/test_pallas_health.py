"""Mosaic health-probe verdict logic (VERDICT r4 #3): the production
Me2017 dispatch must never stall minutes on a cold Mosaic compile — the
probe verdict is persisted per toolchain fingerprint, negative verdicts
fall back to the XLA path (with a daily retry), and env overrides skip
probing entirely."""

import json
import time

import pytest

from nmma_tpu.ops import pallas_health as ph


@pytest.fixture(autouse=True)
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(ph, "_cache_path",
                        lambda: str(tmp_path / "pallas_probe.json"))
    monkeypatch.setattr(ph, "toolchain_fingerprint", lambda: "test-fp")
    ph._MEMO.clear()
    yield
    ph._MEMO.clear()


def test_env_overrides_skip_probe(monkeypatch):
    def boom(timeout=None):
        raise AssertionError("probe must not run under env override")
    monkeypatch.setattr(ph, "probe_mosaic", boom)
    monkeypatch.setenv("NMMA_TPU_DISABLE_PALLAS", "1")
    assert ph.use_pallas_me2017() is False
    monkeypatch.delenv("NMMA_TPU_DISABLE_PALLAS")
    monkeypatch.setenv("NMMA_TPU_FORCE_PALLAS", "1")
    assert ph.use_pallas_me2017() is True


def test_probe_runs_once_and_persists(monkeypatch):
    calls = []

    def fake_probe(timeout=None):
        calls.append(1)
        return True, "fake ok"
    monkeypatch.setattr(ph, "probe_mosaic", fake_probe)
    assert ph.use_pallas_me2017() is True
    assert ph.use_pallas_me2017() is True          # in-process memo
    assert len(calls) == 1
    ph._MEMO.clear()                               # "new process"
    assert ph.use_pallas_me2017() is True          # disk verdict, no probe
    assert len(calls) == 1
    with open(ph._cache_path()) as f:
        assert json.load(f)["test-fp"]["ok"] is True


def test_negative_verdict_falls_back_and_expires(monkeypatch):
    monkeypatch.setattr(ph, "probe_mosaic",
                        lambda timeout=None: (False, "probe exceeded 1s"))
    assert ph.use_pallas_me2017() is False         # probe failed -> XLA
    ph._MEMO.clear()
    # fresh process within the TTL: cached negative, no new probe
    monkeypatch.setattr(ph, "probe_mosaic", lambda timeout=None: (
        (_ for _ in ()).throw(AssertionError("no probe within TTL"))))
    assert ph.use_pallas_me2017() is False
    # expire the TTL: the next process retries the probe and can heal
    cache = ph._load_cache()
    cache["test-fp"]["ts"] = time.time() - ph._NEGATIVE_TTL_S - 1
    with open(ph._cache_path(), "w") as f:
        json.dump(cache, f)
    ph._MEMO.clear()
    monkeypatch.setattr(ph, "probe_mosaic",
                        lambda timeout=None: (True, "healed"))
    assert ph.use_pallas_me2017() is True


def test_real_probe_subprocess_interface():
    """The real probe runs an actual subprocess (CPU here: Mosaic is
    TPU-only, so it must FAIL cleanly and quickly, not hang)."""
    ok, note = ph.probe_mosaic(timeout=240.0)
    assert ok in (True, False)
    assert isinstance(note, str) and note
