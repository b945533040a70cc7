"""Registry invariants: the driver contract depends on these holding."""

from __future__ import annotations

from ub_etl_spark.registry import DRIVER_PRIORITY, load_all


def test_priority_names_exist():
    reg = load_all()
    missing = [n for n in DRIVER_PRIORITY if n not in reg]
    assert not missing, f"DRIVER_PRIORITY references unknown queries: {missing}"


def test_priority_is_prefix_of_load_order():
    ks = list(load_all().keys())
    assert ks[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY


def test_no_duplicate_priority_entries():
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))


def test_priority_fills_driver_window_exactly():
    """The driver checks exactly the first 50 queries(): fewer priority
    entries waste verification slots, more silently pushes the tail out of
    the round's window.  Combined with test_priority_names_exist this
    closes the r6 ADVICE gap: a typo in a wholesale-rewritten window list
    can neither shrink the checked set (load_all() drops unknown names
    silently) nor overflow it, without failing pytest."""
    assert len(DRIVER_PRIORITY) == 50


def test_every_query_has_tier_and_fn():
    for name, spec in load_all().items():
        assert spec.tier in {"A", "Q", "B"}, name
        assert callable(spec.fn), name


def test_driver_window_holds_all_new_or_changed():
    """Everything without a prior driver PASS (r1) must sit inside the
    50-entry window the driver checks."""
    ks = list(load_all().keys())
    window = set(ks[:50])
    assert set(DRIVER_PRIORITY) <= window


def test_oracled_queries_emit_atomic_columns_only(spark, sf_dir):
    """The driver's pandas canonicalizer cannot sort/hash list cells
    (round-2's embedding_quantize red row was exactly that crash), so
    every query with an oracle must emit only atomic column types.
    Array-valued results are serialized long-form (posexplode) or as
    joined strings on both engines."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, f"complex-typed oracle outputs: {offenders}"


def test_no_unquantized_interpolation_in_oracles():
    """Determinism lint (r03 verdict task 2): interpolated order
    statistics (quantile_cont / MEDIAN / PERCENTILE_CONT) may reach an
    oracle-hashed output only through the exact-integer idiom
    ``CAST(2 * <fn>(<integer column>) AS BIGINT)`` — 2x a median of
    longs is an exact BIGINT under EVERY interpolation formula, whereas
    the raw double differs across engine versions in the last ulp
    ((1-f)*a+f*b vs a+f*(b-a)), and FLOOR()/comparisons on it can flip.

    agg_percentile is grandfathered: its raw quantile_cont doubles are
    driver-green since r01 on the driver's own box; churning a proven
    row would cost a verdict, not gain one.
    """
    import re

    grandfathered = {"agg_percentile"}
    pat = re.compile(r"(quantile_cont|median|percentile_cont)\s*\(", re.I)
    offenders = []
    for name, spec in load_all().items():
        if spec.oracle is None or name in grandfathered:
            continue
        for m in pat.finditer(spec.oracle):
            prefix = spec.oracle[max(0, m.start() - 16) : m.start()]
            if not re.search(r"CAST\(\s*2\s*\*\s*$", prefix):
                offenders.append((name, m.group(0).strip()))
    assert not offenders, (
        "raw interpolated order-statistic in oracle output "
        f"(wrap in CAST(2 * ... AS BIGINT)): {offenders}"
    )


def test_no_floor_of_interpolated_quantile():
    """FLOOR/CEIL/ROUND directly on an interpolated quantile is the
    sharpest form of the hazard: when the true quantile lands exactly on
    an integer, a one-ulp cross-engine difference flips the output by a
    whole unit (the pre-r04 agg_winsorized_mean bug).  Select discrete
    (type-1) quantiles by integer rank rule instead."""
    import re

    pat = re.compile(
        r"(floor|ceil|ceiling|round)\s*\(\s*(quantile_cont|median|percentile_cont)",
        re.I,
    )
    offenders = [
        name
        for name, spec in load_all().items()
        if spec.oracle and pat.search(spec.oracle)
    ]
    assert not offenders, f"FLOOR(interpolated quantile) in oracle: {offenders}"
