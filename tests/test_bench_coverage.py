"""Every registered query must carry its own bench row (r3 verdict
task 7): the HEADLINE list and the registry may not drift apart."""

from __future__ import annotations

import importlib.util
import os


def _headline():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_headline_covers_registry_exactly():
    from ub_etl_spark.registry import load_all

    headline, registry = _headline(), load_all()
    missing = sorted(set(registry) - set(headline))
    stale = sorted(set(headline) - set(registry))
    dupes = sorted({n for n in headline if headline.count(n) > 1})
    assert not missing, f"registered queries without a bench row: {missing}"
    assert not stale, f"bench rows for unregistered queries: {stale}"
    assert not dupes, f"duplicate bench rows: {dupes}"


def test_documented_exceptions_name_real_queries():
    """The sanctioned->2x list must reference registered queries only, so
    a rename can't silently orphan an exception entry."""
    from ub_etl_spark.registry import load_all

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    stale = sorted(set(mod.DOCUMENTED_EXCEPTIONS) - set(load_all()))
    assert not stale, f"exception entries for unregistered queries: {stale}"
