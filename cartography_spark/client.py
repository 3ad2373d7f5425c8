"""Read-sink client helpers: the reference's typed read API
(cartography/client/core/tx.py:367-569) over DataFrames.

These are DRIVER-SIDE materialization helpers for small result sets
(rule findings, lookups) — the reference collects every read query into
Python structures the same way. Large results should stay DataFrames;
``iterate_rows`` streams without materializing everything at once.

The retry wrapper the reference needs for transient Neo4j errors
(tx.py:44-299) has no equivalent here: Spark retries failed tasks itself.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame


def read_list_of_values(df: DataFrame) -> list[Any]:
    """First column of every row (tx.py read_list_of_values :367+)."""
    col = df.columns[0]
    return [row[col] for row in df.select(col).collect()]


def read_single_value(df: DataFrame) -> Any:
    """First column of the first row, or None on empty result
    (tx.py read_single_value)."""
    row = df.first()
    return None if row is None else row[df.columns[0]]


def read_list_of_dicts(df: DataFrame) -> list[dict[str, Any]]:
    """Every row as a plain dict (tx.py read_list_of_dict_values)."""
    return [row.asDict(recursive=True) for row in df.collect()]


def read_single_dict(df: DataFrame) -> dict[str, Any] | None:
    """First row as a dict, or None (tx.py read_single_dict)."""
    row = df.first()
    return None if row is None else row.asDict(recursive=True)


def read_list_of_tuples(df: DataFrame) -> list[tuple[Any, ...]]:
    """Every row as a tuple in column order (tx.py read_list_of_tuples)."""
    return [tuple(row) for row in df.collect()]


def iterate_rows(df: DataFrame) -> Iterator[dict[str, Any]]:
    """Stream rows to the driver one partition at a time — the scalable
    variant of read_list_of_dicts (``toLocalIterator`` never holds the
    whole result in driver memory)."""
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)
