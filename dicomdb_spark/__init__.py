"""dicomdb_spark — PySpark-native analytics engine (see SURVEY.md)."""

from __future__ import annotations

from types import ModuleType


def register_for_udf_pickling(module: ModuleType) -> None:
    """Force cloudpickle to serialize a module's functions BY VALUE.

    Module-level functions are normally pickled by reference, which
    breaks every pandas-UDF operator when the driver process wasn't
    launched from the repo root (Python workers can't import
    ``dicomdb_spark``).  UDF-bearing modules call this at import time
    so their closures ship with the task instead.
    """
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(module)
    except Exception:
        # older cloudpickle without the API — fall back to requiring
        # the package on the worker PYTHONPATH
        pass
