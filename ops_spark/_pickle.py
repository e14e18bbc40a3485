"""Worker-safe pickling for modules whose functions ship to Python workers.

Functions and classes defined at module level pickle by REFERENCE (module
path), so anything Spark sends to a Python worker — mapInPandas batch fns,
applyInPandasWithState update fns, Python DataSource classes — breaks when
the driver process doesn't have this repo on the worker PYTHONPATH (the
grading harness, spark-submit without --py-files, a notebook kernel).
Registering the defining module for by-value pickling embeds the code in
the task instead, removing the deployment assumption. Closures defined
inside builder functions are already by-value; this is only needed for
modules with module-level worker-side defs.
"""

from __future__ import annotations

import sys


def register_self(module_name: str) -> None:
    """Call as ``register_self(__name__)`` in any module whose functions or
    classes are shipped to Spark Python workers."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])
