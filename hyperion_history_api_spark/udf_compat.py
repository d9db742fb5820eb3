"""Executor-import independence for Python UDF closures.

The driver contract imports ``__spark_entry__.py`` by file path from
an arbitrary cwd, so the repo directory is on the DRIVER's sys.path
only. Python workers spawned by executors inherit PYTHONPATH from the
JVM's environment — a UDF closure that references module-level
functions is pickled BY REFERENCE (module + qualname) and raises
ModuleNotFoundError worker-side when that module isn't importable
there (observed driving the vanilla-session contract from /tmp:
``doc_bpe_token_stats`` failed in cloudpickle.loads).

Registering the defining module with cloudpickle's pickle-by-value
makes the closure self-contained: the few-KB module body rides the
serialized task and nothing needs importing on the worker. Every
module that defines a Pandas UDF / applyInPandas / mapInPandas
function, or whose helpers are called from inside one, calls
:func:`pickle_by_value` at its bottom.
"""

from __future__ import annotations

import sys


def pickle_by_value(module_name: str) -> None:
    """Best-effort registration; harmless no-op on PySpark builds
    whose vendored cloudpickle lacks the API."""
    try:
        from pyspark import cloudpickle

        mod = sys.modules.get(module_name)
        if mod is not None:
            cloudpickle.register_pickle_by_value(mod)
    except Exception:  # pragma: no cover — best effort
        pass
