"""Plan inspection helpers — make scale properties assertable in tests.

"Would this plan survive a 100× scale-up?" is checked mechanically:
tests assert that filters reach the parquet scan (PushedFilters), that
projections prune the scan schema (ReadSchema), that the dimension side of
the one-to-many join broadcasts, and that hot paths stay inside
WholeStageCodegen.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PushedFilters" in line
    )


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema lines of every scan — column-pruning evidence."""
    return "\n".join(
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "ReadSchema" in line
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle (hash/range) exchange nodes in the plan tree.

    Formatted mode prints each tree node as 'Exchange (n)' (details print
    '(n) Exchange', which doesn't match).  BroadcastExchange is excluded —
    broadcasting the dimension side is precisely NOT a shuffle of the data,
    and conflating the two would penalize the plans we want."""
    import re

    return len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", formatted_plan(df)))


def count_scans(df: DataFrame) -> int:
    """Number of file-scan leaves in the plan — each is a full pass over
    its table, so a 1-table pipeline with N scans reads the data N times.
    Counts the per-node detail headers ('(n) Scan parquet'), not the tree
    rendering, so each scan is counted exactly once."""
    import re

    return len(re.findall(r"^\(\d+\) Scan ", formatted_plan(df), re.M))
