"""Bench-anchor guard (VERDICT r8 item 6): the most recent recorded driver
bench must sit inside the 2x regression gates, and the close-round script's
check logic must agree. A >2x sealed reading fails the suite the round
AFTER it ships — the complement to scripts/close_round.py, which refuses
to seal it in the first place."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from close_round import GATE_FACTOR, HEADLINE_ANCHOR, HEAVY_ANCHOR, check  # noqa: E402


def _latest_bench() -> dict | None:
    paths = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    if not paths:
        return None
    latest = max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    blob = json.load(open(latest))
    return blob.get("parsed", blob)


def test_latest_recorded_bench_inside_gates():
    parsed = _latest_bench()
    if parsed is None:
        pytest.skip("no BENCH_r*.json recorded (fresh checkout)")
    problems = check(parsed)
    assert not problems, f"latest recorded bench breaches a gate: {problems}"


def test_gate_constants_sane():
    # the gates only guard if the anchors stay pinned to BASELINE.md's values
    assert HEADLINE_ANCHOR == 24.7
    assert HEAVY_ANCHOR == 8.2
    assert GATE_FACTOR == 2.0


def test_check_flags_regressions():
    assert check({"value": 100.0, "heavy_total_wall": 5.0})
    assert check({"value": 10.0, "heavy_total_wall": 20.0})
    assert check({"value": 10.0, "heavy_total_wall": 5.0, "errors": {"q": "boom"}})
    assert not check({"value": 10.0, "heavy_total_wall": 5.0})
