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
