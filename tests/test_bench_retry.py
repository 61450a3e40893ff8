"""bench.py must absorb axon tunnel wedges: the measurement runs in a child
process under a timeout and the parent retries (round-3 postmortem: one
un-retried attempt during a wedge cost the round its bench artifact)."""

import json
import subprocess
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _completed(rc, stdout="", stderr=""):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout,
                                       stderr=stderr)


def test_parent_retries_past_wedge_and_prints_json(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        if len(calls) == 2:
            return _completed(1, stderr="UNAVAILABLE: TPU backend setup/compile error")
        return _completed(0, stdout="compile log noise\n"
                          + json.dumps({"metric": "m", "value": 1.0,
                                        "unit": "u", "vs_baseline": 1.0}) + "\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 1e6)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0.0)

    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert len(calls) == 3
    assert len(out) == 1  # exactly one JSON line on stdout
    parsed = json.loads(out[0])
    assert parsed["unit"] == "u"


def test_parent_gives_up_within_budget(monkeypatch, capsys):
    def fake_run(cmd, **kw):
        return _completed(1, stderr="wedged")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 0.5)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0.0)
    rc = bench.main()
    assert rc == 1
    assert capsys.readouterr().out.strip() == ""  # no JSON on failure


def test_child_flag_dispatches_to_measure(monkeypatch):
    # --child must call measure() (the in-process path), never recurse into
    # the parent retry loop.
    src = Path(bench.__file__).read_text()
    assert '"--child" in sys.argv' in src
    assert "measure()" in src
