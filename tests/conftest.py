from __future__ import annotations

from contextlib import contextmanager

import pytest

from dicomdb_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Smoke tier (round-11 VERDICT #4: full suite is ~28 min / 1088 tests;
# iteration needs a <=5-min gate).  Module-level granularity, chosen by
# measured standalone runtime (contract 195 s, functions 26 s,
# engine_units 77 s, domain_model 16 s — ~290 s sharing one session):
# the driver contract (registry shape + oracle dtype parity over all
# 521 oracles — the class of bug that actually burns driver rows) plus
# the core function/unit surface.  test_plans (207 s hint-budget +
# global-window sweeps) and test_determinism (132 s) stay
# full-suite-only to hold the 5-min budget — they guard pre-snapshot
# regressions, not per-edit iteration.  `pytest -m smoke` runs the
# tier; the full suite remains the pre-snapshot gate.
SMOKE_MODULES = {
    "test_contract",
    "test_functions",
    "test_engine_units",
    "test_domain_model",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dicomdb_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


@contextmanager
def patched_registry_attr(attr, fake):
    """Substitute a module-level binding (``load_table``, ``_bars``,
    ...) in EVERY registry chunk module.

    The round-10 registry/ package split copies ``from ... import``
    bindings into each chunk, so patching
    ``dicomdb_spark.registry.<attr>`` alone no longer reaches the
    query bodies — this walks all loaded registry submodules (and the
    package itself) and swaps any module with that binding, restoring
    them afterwards."""
    import sys

    touched = []
    for name, mod in list(sys.modules.items()):
        if (
            name == "dicomdb_spark.registry"
            or name.startswith("dicomdb_spark.registry.")
        ) and getattr(mod, attr, None) is not None:
            touched.append((mod, getattr(mod, attr)))
            setattr(mod, attr, fake)
    try:
        yield
    finally:
        for mod, orig in touched:
            setattr(mod, attr, orig)


@contextmanager
def patched_load_table(fake):
    with patched_registry_attr("load_table", fake):
        yield
