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
