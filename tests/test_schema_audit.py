"""Cross-engine output-type lint (the r03 driver hash-fail class).

The driver value-hashes results after canonicalizing BOTH engines through
pandas.  DuckDB's HUGEINT (type of SUM(integer)) and DECIMAL columns land
in pandas as float64/object while Spark's same column is int64 — so the
driver hash diverges even when fetchall()-based local parity (exact
python ints) is green.  r03 lost events_funnel_rates /
agg_weighted_median / events_anomaly_mad to exactly this; the sweep found
14 more not-yet-driver-checked queries carrying the same hazard.

Rule: every oracle output column must be pandas-stable and family-match
the Spark schema — CAST(SUM(..) AS BIGINT), CAST(.. AS DOUBLE), never a
bare integer SUM or DECIMAL in the projection.
"""

from __future__ import annotations


def test_no_pandas_unstable_oracle_columns():
    from tools.schema_audit import audit

    findings = audit()
    assert not findings, (
        "pandas-unstable oracle output columns (driver will hash-fail even "
        f"if local parity passes): {findings}"
    )
