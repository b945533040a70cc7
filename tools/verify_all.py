"""One-command release gate: chains every verification surface in the
cheapest-first order and stops at the first failure.

    python tools/verify_all.py            # fast gate (~10 min)
    python tools/verify_all.py --full     # adds sf0.01 parity + bench smoke

Stages:
  1. driver-contract smoke  (entry() runs, queries()/oracle_sql() sane)
  2. parity @ sf0.001       (every registered query vs its DuckDB oracle)
  3. pytest                 (unit / property / streaming / storage)
  4. [--full] parity @ sf0.01  (the driver's scale)
  5. [--full] parity @ sf0.01, 7-way  (partitioning-independence: same
     hashes under a different shuffle layout — the 1000-executor
     reproducibility property)
  6. [--full] bounds        (rows-only guarantees measured)
  7. [--full] bench smoke   (all headline queries execute; sf0.001, budgeted)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    t0 = time.perf_counter()
    print(f"==> {label}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        print(f"FAILED: {label} ({dt:.0f}s)", flush=True)
        sys.exit(r.returncode)
    print(f"ok: {label} ({dt:.0f}s)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    py = sys.executable
    run(
        "driver contract",
        [
            py,
            "-c",
            "import sys; sys.path.insert(0, '.');"
            "from ub_etl_spark.session import get_spark;"
            "import __spark_entry__ as E;"
            "s = get_spark('gate');"
            "rows = E.entry(s).collect();"
            "q, o = E.queries(), E.oracle_sql();"
            "assert rows and len(q) >= len(o) > 0, (len(rows), len(q), len(o));"
            "print(len(rows), 'rows;', len(q), 'queries;', len(o), 'oracles')",
        ],
    )
    run("parity sf0.001", [py, "tools/parity.py", "--sf", "/root/testdata/sf0.001"])
    run("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"])
    if args.full:
        run("parity sf0.01", [py, "tools/parity.py", "--sf", "/root/testdata/sf0.01"])
        run(
            "parity sf0.01 @ 7-way",
            [py, "tools/parity.py", "--sf", "/root/testdata/sf0.01"],
            env={"SPARK_GRAFT_CPUS": "7"},
        )
        run("bounds", [py, "tools/bounds.py", "--sf", "/root/testdata/sf0.01"])
        run(
            "bench smoke",
            [py, "bench.py"],
            env={
                "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
                "SPARK_GRAFT_BENCH_BUDGET_S": "900",
            },
        )
    print("ALL GATES GREEN")


if __name__ == "__main__":
    main()
