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
  long-tail sweep (VERDICT r10 item 8): a full-registry sweep_all run (or
  --sweep FILE to reuse one) is compared against the newest committed
  SWEEP_r*.json — a >2x per-query regression past a 1 s floor, a vanished
  query, or a sweep error refuses the seal; the slowest-15 table is printed
  as the seal record. --skip-sweep skips it loudly.

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
# Re-anchored in round 11 (BASELINE.md): bench.py now evicts the graph
# edge memo before every timed run, so graph_triangles is measured COLD —
# the old 8.2 s r8 anchor was a warm-protocol number on the pre-rewrite
# wedge-join form. 3.4 s = the round-11 closing cold heavy total.
HEAVY_ANCHOR = 3.4  # sec, sf0.1 (BASELINE.md r11 cold-protocol anchor)
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
        ROUND12_RESAMPLE,
        load_all_queries,
    )

    staged = set(DRIVER_WINDOW) | DEFERRED_FIRST_ROW | ROUND12_RESAMPLE
    names = [*load_all_queries(), *extra_names]  # extras: test seam
    orphans = sorted(n for n in names if n not in sampled | staged)
    if orphans:
        return [
            f"{len(orphans)} operators have NO driver row and NO staged "
            f"window slot: {orphans[:10]}{'...' if len(orphans) > 10 else ''}"
        ]
    return []


# Long-tail regression guard (VERDICT r10 item 8): the headline+heavy bench
# covers 20 of ~430 queries; round-10's biggest win (llm_minhash_lsh, 42.5 s)
# was invisible to it. The seal therefore also compares a full-registry
# sweep (scripts/sweep_all.py) against the newest committed SWEEP_r*.json
# and refuses on a >2x regression. The 2x factor sits above the host's
# documented ±40% noise band; the absolute floor keeps 0.2 s -> 0.5 s
# latency jitter from tripping the gate.
SWEEP_REGRESSION_FACTOR = 2.0
SWEEP_ABS_FLOOR_SEC = 1.0


def check_sweep(sweep_path: str | None) -> list[str]:
    """Compare a sweep JSON against the newest committed SWEEP_r*.json.

    Prints the slowest-15 table (the seal record). Returns problems for
    queries that regressed >2x (and past the absolute floor) or vanished.
    With no committed reference yet, records the table and passes.
    """
    import glob

    if sweep_path is None:
        print("sweep guard: running scripts/sweep_all.py (use --sweep FILE to reuse)")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "sweep_all.py"),
             "--runs", "2", "--out", "/tmp/close_round_sweep.json"],
            capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            return [f"sweep_all.py failed: {proc.stderr[-500:]}"]
        sweep_path = "/tmp/close_round_sweep.json"
    cur = json.load(open(sweep_path))
    timings: dict[str, float] = cur.get("timings", cur)
    if cur.get("errors"):
        return [f"sweep recorded query errors: {cur['errors']}"]
    print("sweep slowest-15 (the seal record):")
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name:28s} {sec:7.3f}")
    refs = sorted(glob.glob(os.path.join(REPO, "SWEEP_r*.json")))
    if not refs:
        print("sweep guard: no committed SWEEP_r*.json reference yet — recording only")
        return []
    ref = json.load(open(refs[-1]))
    ref_t: dict[str, float] = ref.get("timings", ref)
    problems = []
    for name, prev in ref_t.items():
        now = timings.get(name)
        if now is None:
            problems.append(f"sweep: {name} present in {os.path.basename(refs[-1])} "
                            f"but missing from the current sweep")
        elif now > max(SWEEP_REGRESSION_FACTOR * prev, SWEEP_ABS_FLOOR_SEC):
            problems.append(
                f"sweep: {name} regressed {prev:.3f}s -> {now:.3f}s "
                f"(>{SWEEP_REGRESSION_FACTOR}x vs {os.path.basename(refs[-1])})"
            )
    return problems


def main() -> int:
    if "--skip-freshness" in sys.argv:
        sys.argv.remove("--skip-freshness")
        freshness: list[str] = []
    else:
        freshness = check_driver_row_freshness()
    sweep_file = None
    skip_sweep = False
    if "--skip-sweep" in sys.argv:
        sys.argv.remove("--skip-sweep")
        skip_sweep = True
        print("WARNING: --skip-sweep — the long-tail regression guard did not run")
    if "--sweep" in sys.argv:
        i = sys.argv.index("--sweep")
        sweep_file = sys.argv[i + 1]
        del sys.argv[i : i + 2]
    if len(sys.argv) > 2 and sys.argv[1] == "--reuse":
        blob = json.load(open(sys.argv[2]))
        parsed = blob.get("parsed", blob)  # accept BENCH_r{N}.json or raw line
        src = sys.argv[2]
    else:
        parsed = fresh_bench()
        src = "fresh bench.py run"
    sweep_problems = [] if skip_sweep else check_sweep(sweep_file)
    problems = freshness + check(parsed) + sweep_problems
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
