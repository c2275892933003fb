"""Python UDTF surface (Spark 4 `pyspark.sql.functions.udtf`) —
row → table expansion for shapes `explode` can't express.

The engine's standing rule (SURVEY.md §2.9, COVERAGE.md): anything a
native expression can do stays native — X1/X2 were deliberately
re-expressed without UDFs, chunking/shingling are `transform`/
`sequence`/`explode` compositions, and `tools/audit_plans.py` fails
any registered query whose plan contains a row-at-a-time Python
stage.  UDTFs are therefore OFF the hot path by policy; this module
exists because the *API surface* is part of engine completeness — a
user porting a pipeline with a custom table function needs the
pattern, the registration, and the SQL-side `TABLE()` call shape.

Shipped UDTF: ``SessionizeEvents`` — gap-based sessionization of one
user's pre-sorted event block into session rows.  It is the genuinely
UDTF-shaped example: variable-row-count output driven by running
Python state (current session accumulator) with `terminate()` flushing
the tail — the lifecycle hooks (`eval` per row, `terminate` at end)
that distinguish a UDTF from a scalar UDF.  The production path for
the same semantics is `streaming/sessionize.py::sessionize_batch`
(two native windows, zero Python); equivalence is pinned in
`tests/test_tablefn.py`.
"""

from __future__ import annotations


def make_sessionize_udtf(gap_seconds: int = 1800):
    """Build a sessionize UDTF class (gap closed over, no Spark-side
    params needed).  Returns the DECORATED udtf object; call
    ``spark.udtf.register("sessionize_events", obj)`` for SQL use.

    Drive the per-user ordering with the input-table clause — the UDTF
    instance lifecycle is per input partition, so the clause IS the
    correctness contract::

        SELECT u.user_id, s.* FROM events AS e,
        LATERAL sessionize_events(TABLE(e) PARTITION BY user_id ORDER BY ts) s

    (or ``WITH SINGLE PARTITION ORDER BY ts`` for one series).  Emits
    one row per closed session: (session_start, session_end, n_events).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="session_start: double, session_end: double, n_events: int")
    class SessionizeEvents:
        def __init__(self):
            self.start: float | None = None
            self.last: float | None = None
            self.n = 0

        def eval(self, ts):
            # TABLE(...) input passes the whole Row (a tuple subclass);
            # scalar-arg calls pass the bare value.  Single-column
            # contract: unwrap, then coerce — VALUES/decimal columns
            # arrive as Decimal, which a double output column would
            # silently NULL.
            if isinstance(ts, tuple):
                ts = ts[0]
            if ts is None:
                return
            ts = float(ts)
            if self.last is not None and ts - self.last > gap_seconds:
                yield (self.start, self.last, self.n)
                self.start, self.n = ts, 0
            if self.start is None:
                self.start = ts
            self.last = ts
            self.n += 1

        def terminate(self):
            if self.start is not None:
                yield (self.start, self.last, self.n)

    return SessionizeEvents
