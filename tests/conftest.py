from __future__ import annotations

from contextlib import contextmanager

import pytest

from dicomdb_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


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
