"""Session-scoped scratch storage for query results that must outlive
their producing job but never touch the driver.

Several registered queries end in an executed artifact (a drained
stream, a foreachBatch ledger) whose backing files live under /tmp.
Round 5 cleaned those up by ``collect()``-ing the result and deleting
the files — which re-materializes a user-cardinality result on the
driver, a guaranteed OOM at 100 TB (the reference processes attempt
streams far larger than any driver heap). The scale-correct pattern is
the one used here:

- every such query WRITES its final result to a per-process scratch
  directory (a distributed executor-side parquet write, one pass),
- returns the LAZY parquet reader over it (explicit schema, so even a
  zero-row result round-trips), and
- the whole scratch root is deleted once, at interpreter exit —
  plus a best-effort sweep of roots left by dead processes, so
  crashed runs cannot accumulate garbage under /tmp.

Nothing ever moves through the driver; the returned DataFrame is a
plain file scan that composes with further transformations, and the
temp hygiene that motivated the collect() survives.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

_PREFIX = "ddspark_scratch_"
_root: str | None = None


def _sweep_dead_roots(tmp: str) -> None:
    """Remove scratch roots whose owning PID no longer exists (best
    effort — a PID reused by an unrelated process just defers the
    sweep to that process's own exit)."""
    for name in os.listdir(tmp):
        if not name.startswith(_PREFIX):
            continue
        pid_part = name[len(_PREFIX):].split("_", 1)[0]
        if not pid_part.isdigit():
            continue
        pid = int(pid_part)
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)
        except PermissionError:
            pass  # alive, owned by someone else


def scratch_root() -> str:
    """This process's scratch root (created on first use, removed at
    interpreter exit)."""
    global _root
    if _root is None:
        tmp = tempfile.gettempdir()
        _sweep_dead_roots(tmp)
        _root = os.path.join(tmp, f"{_PREFIX}{os.getpid()}_{uuid.uuid4().hex[:8]}")
        os.makedirs(_root, exist_ok=True)
        atexit.register(shutil.rmtree, _root, ignore_errors=True)
    return _root


def scratch_dir(name: str) -> str:
    """A fresh, unique subdirectory path under the scratch root (not
    created — Spark writers want a nonexistent target). One new dir
    per call: use :func:`scratch_path` instead when the caller
    overwrites the same logical artifact repeatedly, or a long-lived
    session accumulates one copy per invocation until exit."""
    return os.path.join(scratch_root(), f"{name}_{uuid.uuid4().hex[:8]}")


def scratch_path(name: str) -> str:
    """A STABLE per-process subdirectory path for ``name``: repeated
    calls return the same path, so mode=overwrite writers replace
    their previous output instead of leaking one copy per invocation
    across a long session (bench loops, notebooks, multi-drive
    processes). Still process-scoped — no cross-user or concurrent-
    process collisions — and swept at interpreter exit. Callers must
    re-read AFTER each overwrite; a DataFrame returned from an
    earlier call lazily points at replaced files."""
    return os.path.join(scratch_root(), name)


def materialize(df: DataFrame, name: str = "result") -> DataFrame:
    """Execute ``df`` once into scratch parquet (a distributed write —
    no data ever reaches the driver) and return the lazy reader over
    the files. The explicit read schema keeps zero-row results and
    timestamp types exact."""
    spark: SparkSession = df.sparkSession
    path = scratch_dir(name)
    df.write.mode("overwrite").parquet(path)
    return spark.read.schema(df.schema).parquet(path)
