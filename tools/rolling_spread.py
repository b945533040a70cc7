"""Rolling-floor spread demonstration (r12 verdict task 5) — reproduce
the 5-point table in bench.py's spread comment from the sidecars.

Recomputes every available detail sidecar's rolling aggregate on the
CURRENT ORACLE_FLOOR.json and the PINNED cut (bench.ROLLING_CUT_S), so
the denominator and the query set are identical across points and only
each run's Spark numerators vary.  This is the like-for-like form the
pinned-cut aggregate emits going forward; for historical sidecars
(emitted under the old per-session cut) it is the fair restatement.

Sources, oldest first:
  - committed bench_detail.json at the r12 sidecar commits (git show)
  - the round-stamped gitignored sidecars (bench_detail_r*.json)
  - the current committed bench_detail.json
  - the gitignored per-run archive (bench_archive/*.json — every
    bench.py write mirrors itself there since r14, so overwritten runs
    stay restatable; live files' own mirror copies are deduped by
    written_at)

Caveat: the table includes every sidecar on disk for context, but the
SAME-PLAN demonstration (the 5-point claim in bench.py's comment) is the
r12-a..r13 subset — no registered plan changed between r12 and r13,
while r11's numerators predate the r12 basket/containment reworks.

Usage: python tools/rolling_spread.py
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# historical committed sidecars (r12 rolling-floor era, oldest first);
# pre-r12 sidecars predate ORACLE_FLOOR.json and are not comparable.
# r13-c is the r13 quiet-box committed sidecar (pinned-cut run 3, agg
# 1.29) — overwritten in the working tree by the r14 refresh before the
# bench_archive/ convention existed, so it is restated from git.
GIT_POINTS = [("r12-a", "2fe5d11"), ("r12-b", "e705999"), ("r13-c", "7c08cf2")]

# shown for context but EXCLUDED from the headline spread: numerators
# measured on plans that no longer ship (r11 predates the r12
# basket/containment reworks)
CONTEXT_ONLY = {"r11"}


def main() -> None:
    from bench import ROLLING_CUT_S

    floors_doc = json.load(open(os.path.join(ROOT, "ORACLE_FLOOR.json")))["sf0.1"]
    floors = {n: e["s"] if isinstance(e, dict) else e for n, e in floors_doc.items()}
    fixed_set = sorted(n for n in floors if floors[n] >= ROLLING_CUT_S)

    docs: list[tuple[str, dict]] = []
    for tag, ref in GIT_POINTS:
        try:
            docs.append(
                (tag, json.loads(subprocess.check_output(
                    ["git", "-C", ROOT, "show", f"{ref}:bench_detail.json"]
                )))
            )
        except Exception as exc:  # noqa: BLE001
            print(f"(skipping {tag}: {exc})")
    for path in sorted(glob.glob(os.path.join(ROOT, "bench_detail_r*.json"))):
        docs.append((os.path.basename(path)[len("bench_detail_"):-len(".json")],
                     json.load(open(path))))
    docs.append(("committed", json.load(open(os.path.join(ROOT, "bench_detail.json")))))
    # the per-run archive (r13 verdict task 3): every bench.py write is
    # mirrored into bench_archive/<tag>.<stamp>.json, so runs that later
    # overwrote their sidecar are still restatable here.  Entries whose
    # written_at matches an already-listed doc are the live files' own
    # mirror copies — skip those.
    # written_at is second-granularity and bench.py uniquifies archive
    # FILENAMES precisely because two runs can share a second — so dedup
    # on (written_at, full doc equality), not the stamp alone (ADVICE
    # r14): a distinct same-second run must appear as its own point.
    seen: dict[str, list[dict]] = {}
    for _, d in docs:
        if d.get("written_at"):
            seen.setdefault(d["written_at"], []).append(d)
    for path in sorted(glob.glob(os.path.join(ROOT, "bench_archive", "*.json"))):
        doc = json.load(open(path))
        stamp = doc.get("written_at")
        if stamp and any(doc == prior for prior in seen.get(stamp, ())):
            continue  # a live file's own mirror copy
        if stamp:
            seen.setdefault(stamp, []).append(doc)
        docs.append((os.path.basename(path)[:-len(".json")], doc))

    pts = []
    print(f"pinned cut {ROLLING_CUT_S}s -> fixed set of {len(fixed_set)} queries; "
          "current floors as denominator\n")
    print(f"{'point':12s} {'agg':>6s}  {'as-emitted':>10s}  per-pass load_avg_1m")
    for tag, doc in docs:
        if doc.get("sf") != 0.1:
            # a sidecar from an sf0.001/sf0.01 run must not be divided
            # by sf0.1 floors (same guard the pytest gates apply)
            print(f"{tag:12s}   (skipped: sf={doc.get('sf')}, not 0.1)")
            continue
        t = doc["queries"]
        have = [n for n in fixed_set if n in t]
        agg = sum(t[n] for n in have) / sum(floors[n] for n in have)
        load = [m.get("load_avg_1m") for m in doc.get("machine_state_per_pass", [])]
        context = tag in CONTEXT_ONLY
        if not context:
            pts.append(agg)
        print(f"{tag:12s} {agg:6.3f}  "
              f"{doc.get('aggregate_ratio_excl_subfloor_vs_rolling_floor', '-'):>10}  "
              f"{load}{'  (context only — pre-r12 plans)' if context else ''}")
    if len(pts) > 1:
        spread = (max(pts) - min(pts)) / statistics.mean(pts)
        print(f"\n{len(pts)} same-plan points: spread {spread * 100:.1f}% "
              f"(min {min(pts):.3f}, max {max(pts):.3f}); residual variation is "
              "numerator load (see bench.py's spread comment)")


if __name__ == "__main__":
    main()
