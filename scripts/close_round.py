"""Round-close gate (VERDICT r8 item 6): refuse to seal a round without a
fresh, in-gate closing bench.

The round-8 lesson: a 20x regression in llm_minhash_dedup hid for four
batches because nothing forced a bench between touching a headline-family
operator and sealing the round. This script IS that forcing function — run
it as the last step of every round:

    python scripts/close_round.py            # runs bench.py fresh, checks gates
    python scripts/close_round.py --reuse F  # check an existing bench JSON file

Gates (BASELINE.md anchors):
  headline_17q_total_wall  <= 2 x 24.7 s  (r1 cold-protocol anchor)
  heavy_total_wall         <= 2 x  8.2 s  (r8 pinned anchor)
  every query present, zero "errors" entries
  driver-row freshness (VERDICT r9 item 5): every registered operator has a
  CORRECTNESS_r*.json row, or sits in the current DRIVER_WINDOW (getting one
  this round), or in an explicit deferral ledger — catches the
  st_approx_distinct class (registered in r8, never sampled, unstaged)
  automatically. Skip with --skip-freshness only to measure on a broken tree.

Exit 0 = sealed; exit 1 = DO NOT SEAL (fix or re-measure on an idle host —
concurrent scaling studies inflate readings ~20%, BASELINE.md round-8 note).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADLINE_ANCHOR = 24.7  # sec, sf0.1 (BASELINE.md r1 median)
HEAVY_ANCHOR = 8.2  # sec, sf0.1 (BASELINE.md r8 pinned)
GATE_FACTOR = 2.0


def fresh_bench() -> dict:
    """Run bench.py and parse its one JSON line."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
        None,
    )
    if proc.returncode != 0 or line is None:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:])
        raise SystemExit("SEAL REFUSED: bench.py failed or printed no JSON line")
    return json.loads(line)


def check(parsed: dict) -> list[str]:
    problems: list[str] = []
    headline = parsed.get("value")
    heavy = parsed.get("heavy_total_wall")
    if headline is None:
        problems.append("no headline total in bench output")
    elif headline > GATE_FACTOR * HEADLINE_ANCHOR:
        problems.append(
            f"headline {headline:.2f}s > gate {GATE_FACTOR * HEADLINE_ANCHOR:.1f}s"
        )
    if heavy is None:
        problems.append("no heavy_total_wall in bench output")
    elif heavy > GATE_FACTOR * HEAVY_ANCHOR:
        problems.append(f"heavy {heavy:.2f}s > gate {GATE_FACTOR * HEAVY_ANCHOR:.1f}s")
    if parsed.get("errors"):
        problems.append(f"bench recorded query errors: {parsed['errors']}")
    return problems


def check_driver_row_freshness(extra_names: tuple = ()) -> list[str]:
    """Every registered operator must have driver evidence or a staged slot.

    A name is OK if it appears in ANY CORRECTNESS_r*.json (the driver saw
    it at least once), in DRIVER_WINDOW (it gets a row this round), or in
    a deferral ledger (explicitly staged for the next window). A name in
    none of those is exactly how st_approx_distinct went two rounds
    without evidence."""
    import glob

    sampled: set[str] = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            sampled |= set(json.load(open(f)))
        except Exception:
            pass  # a malformed round file must not mask missing names
    sys.path.insert(0, REPO)
    from air_quality_data_pipeline_spark.registry import (
        DEFERRED_FIRST_ROW,
        DRIVER_WINDOW,
        ROUND11_RESAMPLE,
        load_all_queries,
    )

    staged = set(DRIVER_WINDOW) | DEFERRED_FIRST_ROW | ROUND11_RESAMPLE
    names = [*load_all_queries(), *extra_names]  # extras: test seam
    orphans = sorted(n for n in names if n not in sampled | staged)
    if orphans:
        return [
            f"{len(orphans)} operators have NO driver row and NO staged "
            f"window slot: {orphans[:10]}{'...' if len(orphans) > 10 else ''}"
        ]
    return []


def main() -> int:
    if "--skip-freshness" in sys.argv:
        sys.argv.remove("--skip-freshness")
        freshness: list[str] = []
    else:
        freshness = check_driver_row_freshness()
    if len(sys.argv) > 2 and sys.argv[1] == "--reuse":
        blob = json.load(open(sys.argv[2]))
        parsed = blob.get("parsed", blob)  # accept BENCH_r{N}.json or raw line
        src = sys.argv[2]
    else:
        parsed = fresh_bench()
        src = "fresh bench.py run"
    problems = freshness + check(parsed)
    headline = parsed.get("value")
    heavy = parsed.get("heavy_total_wall")
    print(
        f"closing bench ({src}): headline={headline}s "
        f"(anchor {HEADLINE_ANCHOR}, gate {GATE_FACTOR * HEADLINE_ANCHOR:.1f}), "
        f"heavy={heavy}s (anchor {HEAVY_ANCHOR}, gate {GATE_FACTOR * HEAVY_ANCHOR:.1f})"
    )
    if problems:
        for p in problems:
            print("SEAL REFUSED:", p)
        return 1
    print("SEALED: closing bench inside both gates")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
