"""Scale smoke: measure how headline query cost scales with data volume.

Synthesizes a K-times-larger lineitem/orders in /tmp by unioning shifted
copies of the sf0.1 tables (keys offset per copy so join/agg cardinalities
scale realistically), then times a representative query set at 1x and Kx.
A near-linear ratio (~K for scans/aggs, <=K log K for sorts) is the
evidence that the plans survive scale-up: no accidental cross products, no
collapse-to-one-partition, no driver-side loops.

Usage: python tools/scale_smoke.py [--k 10] [--sf /root/testdata/sf0.1]
Writes SCALING.md at the repo root.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ub_etl_spark.functions.exact import cents, cents_disc, csum  # noqa: E402
from ub_etl_spark.session import get_spark  # noqa: E402


def amplify(spark, src: str, out: str, k: int) -> None:
    """K shifted copies of lineitem+orders: key spaces offset per copy so
    distinct counts, join fan-out, and group cardinality all scale by K."""
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    o = spark.read.parquet(f"{src}/orders.parquet")
    max_ok = o.agg(F.max("o_orderkey")).first()[0] + 1
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok)) for i in range(k)
    ]
    o_parts = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * max_ok)) for i in range(k)
    ]
    big_li = li_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.unionByName(p)
    big_o = o_parts[0]
    for p in o_parts[1:]:
        big_o = big_o.unionByName(p)
    big_li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    big_o.write.mode("overwrite").parquet(f"{out}/orders.parquet")


def queries(spark, d: str):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    o = spark.read.parquet(f"{d}/orders.parquet")
    return {
        "agg_groupby": li.filter(
            F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            csum("l_quantity", "sum_qty"),
            (F.sum(cents_disc("l_extendedprice", "l_discount")) / 10000.0).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        ),
        "join_agg": li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n")),
        "window_rank": o.select(
            "o_orderkey",
            F.row_number()
            .over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("o_orderstatus")
                .orderBy(F.desc("o_totalprice"), "o_orderkey")
            )
            .alias("rn"),
        ).filter(F.col("rn") <= 3),
        "topk": li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber").limit(100),
        "distinct_count": o.agg(F.countDistinct("o_custkey").alias("n")),
        "running_sum": o.select(
            "o_custkey",
            (
                F.sum(cents("o_totalprice")).over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("o_custkey")
                    .orderBy("o_orderdate", "o_orderkey")
                    .rowsBetween(-(1 << 31), 0)
                )
                / 100.0
            ).alias("rt"),
        ),
    }


def run(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark("scale_smoke")
    big_dir = os.path.join(tempfile.gettempdir(), f"ub_etl_scale_{args.k}x")
    shutil.rmtree(big_dir, ignore_errors=True)
    os.makedirs(big_dir)
    amplify(spark, args.sf, big_dir, args.k)

    lines = [
        "# SCALING — measured cost vs data volume (tools/scale_smoke.py)\n",
        f"Base: {args.sf}; amplified: {args.k}x shifted copies (key spaces offset,",
        "so join fan-out and group cardinality scale realistically).",
        "Ratio ~K = linear scaling; sorts may show K..K log K.  Each cell is",
        "min-of-2 steady-state seconds (noop sink).\n",
        f"| query | 1x sec | {args.k}x sec | ratio |",
        "|---|---|---|---|",
    ]
    for name in queries(spark, args.sf):
        q1 = queries(spark, args.sf)[name]
        qk = queries(spark, big_dir)[name]
        t1 = min(run(q1) for _ in range(2))
        tk = min(run(qk) for _ in range(2))
        ratio = tk / t1 if t1 > 0 else float("inf")
        lines.append(f"| {name} | {t1:.3f} | {tk:.3f} | {ratio:.1f}x |")
        print(f"{name:16s} 1x={t1:.3f}s {args.k}x={tk:.3f}s ratio={ratio:.1f}x")
    lines.append(
        f"\nA ratio well under {args.k}x means fixed per-query overhead still"
        " dominates at this volume; well over it would flag a super-linear"
        " plan (the failure mode this smoke exists to catch).\n"
    )
    with open("/root/repo/SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")
    shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
