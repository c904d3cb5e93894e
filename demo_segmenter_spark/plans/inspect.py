"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters reach
the parquet scan (PushedFilters), projections prune columns
(ReadSchema), small dims broadcast (BroadcastHashJoin), global top-k
avoids a full sort (TakeOrderedAndProject), and the shuffle count per
query stays at its designed minimum. A plan regression that would only
hurt at scale fails fast here, at test scale.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters lists from the formatted plan."""
    plan = explain_str(df)
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters:\s*\[([^\]]+)\]", plan)
        if m.group(1).strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings from the formatted plan (one per scan)."""
    plan = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema:\s*(struct<[^>]*>)", plan)]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only (BroadcastExchange excluded).

    Counted on the SIMPLE-mode plan: formatted mode prints the node as
    bare ``Exchange (n)`` with the partitioning on a separate Arguments
    line, so the pattern below never matched there and every shuffle
    budget silently asserted 0 <= N (caught in a round-1 audit).
    SinglePartition exchanges count too — a global funnel is the worst
    shuffle of all at scale.

    Once the DataFrame has been executed, AQE's simple-mode explain
    appends an ``== Initial Plan ==`` section after the final plan —
    counting the whole string then double-counts every exchange, so
    everything from that marker on is dropped."""
    plan = explain_str(df, mode="simple").split("== Initial Plan ==")[0]
    return (
        len(re.findall(r"Exchange hashpartitioning", plan))
        + len(re.findall(r"Exchange rangepartitioning", plan))
        + len(re.findall(r"Exchange SinglePartition", plan))
    )
