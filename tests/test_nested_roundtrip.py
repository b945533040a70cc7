"""Property-based explode/rebuild round-trip (SURVEY.md §5.4):
explode then collect_list reconstructs the source array (A4-A6 vs Q17)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

arrays = st.lists(
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=6), min_size=1, max_size=8
)
maps = st.lists(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=99),
        max_size=5,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(arrays)
def test_explode_collect_roundtrip_arrays(spark, data):
    df = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(data)], "id long, arr array<int>"
    )
    rebuilt = (
        df.select("id", F.explode_outer("arr").alias("v"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("v")).alias("arr2"))
    )
    orig = df.select("id", F.sort_array("arr").alias("arr1"))
    joined = orig.join(rebuilt, "id")
    # empty arrays become NULL rows under explode_outer and rebuild to []
    mismatches = joined.filter(
        ~(
            (F.col("arr1") == F.col("arr2"))
            | ((F.size("arr1") == 0) & (F.size("arr2") == 0))
        )
    ).count()
    assert mismatches == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(maps)
def test_explode_map_roundtrip(spark, data):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(data)], "id long, m map<string,int>"
    )
    rebuilt = (
        df.select("id", F.explode_outer("m").alias("k", "v"))
        .filter(F.col("k").isNotNull())
        .groupBy("id")
        .agg(F.map_from_entries(F.sort_array(F.collect_list(F.struct("k", "v")))).alias("m2"))
    )
    orig = df.filter(F.size("m") > 0).select("id", "m")
    joined = orig.join(rebuilt, "id")
    bad = joined.filter(
        F.size(F.map_filter("m", lambda k, v: F.element_at("m2", k) != v)) > 0
    ).count()
    assert bad == 0
    assert joined.filter(F.size("m") != F.size("m2")).count() == 0
