"""Tile assignment: leaf CellID pandas UDF + hierarchy as Spark Column bit math.

The only Python in the hot path is the Hilbert encode UDF (8 vectorized table
lookups per batch, Arrow-ferried). Everything downstream — parent truncation,
range endpoints, level, validity — is pure Spark SQL bit arithmetic
(cellid.rs:265-268, 442-449 semantics), so Catalyst codegens it and can
partition/prune on tile columns with no Python round-trip.

u64<->i64 discipline: CellIDs are stored as two's-complement LongType. Bitwise
ops and +/- are bit-identical to u64. Range predicates (range_min <= leaf <=
range_max) stay correct under signed comparison because a cell's leaf range
never crosses the sign bit (the sign bit is the top face bit: faces 4-5 are
negative, faces 0-3 positive; a range is always within one face).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernel import hilbert
from ..kernel.constants import MAX_LEVEL, NUM_FACES, POS_BITS

__all__ = [
    "leaf_cellid_udf",
    "cellid_to_latlng_udf",
    "cellid_to_token_udf",
    "with_leaf_cellid",
    "parent_col",
    "parent_var_col",
    "level_col",
    "range_min_col",
    "range_max_col",
    "is_valid_col",
    "face_col",
]


# pandas UDFs are built lazily (decorating at import time requires an active
# SparkSession for DDL-type parsing); factories are memoized per process.
_UDF_CACHE: dict[str, object] = {}


def leaf_cellid_udf():
    """(lat_deg, lng_deg) -> leaf CellID as i64 (bit-pattern of the u64 id)."""
    if "leaf" not in _UDF_CACHE:

        @pandas_udf("long")
        def _leaf(lat: pd.Series, lng: pd.Series) -> pd.Series:
            cid = hilbert.cellid_from_latlng(
                lat.to_numpy(np.float64), lng.to_numpy(np.float64)
            )
            return pd.Series(cid.view(np.int64))

        _UDF_CACHE["leaf"] = _leaf
    return _UDF_CACHE["leaf"]


def cellid_to_latlng_udf():
    """CellID i64 -> cell-center (lat, lng) degrees."""
    if "center" not in _UDF_CACHE:

        @pandas_udf("struct<lat:double, lng:double>")
        def _center(cid: pd.Series) -> pd.DataFrame:
            lat, lng = hilbert.cellid_to_latlng(cid.to_numpy(np.int64).view(np.uint64))
            return pd.DataFrame({"lat": lat, "lng": lng})

        _UDF_CACHE["center"] = _center
    return _UDF_CACHE["center"]


def cellid_to_token_udf():
    """CellID i64 -> canonical hex token (debug/interchange, not hot path)."""
    if "token" not in _UDF_CACHE:
        from ..kernel.hierarchy import to_token

        @pandas_udf("string")
        def _token(cid: pd.Series) -> pd.Series:
            return cid.map(lambda v: to_token(np.int64(v).view(np.uint64)))

        _UDF_CACHE["token"] = _token
    return _UDF_CACHE["token"]


def with_leaf_cellid(
    df: DataFrame, lat_col: str = "lat", lng_col: str = "lng", out: str = "cell_id"
) -> DataFrame:
    return df.withColumn(out, leaf_cellid_udf()(F.col(lat_col), F.col(lng_col)))


def _lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def parent_col(cell: Column | str, level: int) -> Column:
    """Ancestor cell at ``level`` — pure bit expression (cellid.rs:265-268)."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    lsb = _lsb_for_level(level)
    return (cell.bitwiseAND(F.lit(~(lsb - 1)))).bitwiseOR(F.lit(lsb))


def _lsb_col(cell: Column) -> Column:
    return cell.bitwiseAND(-cell)


def parent_var_col(cell: Column | str, level: Column) -> Column:
    """Ancestor at a per-row level column — still pure bit math.

    lsb = 1 << 2*(30-level); parent = (id & -lsb) | lsb  (cellid.rs:265-268).
    """
    cell = F.col(cell) if isinstance(cell, str) else cell
    lsb = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.lit(2) * (F.lit(MAX_LEVEL) - level)).cast("int")
    )
    return cell.bitwiseAND(-lsb).bitwiseOR(lsb)


def range_min_col(cell: Column | str) -> Column:
    """First leaf covered by the cell (cellid.rs:442-444)."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    return cell - (_lsb_col(cell) - F.lit(1))


def range_max_col(cell: Column | str) -> Column:
    """Last leaf covered by the cell (cellid.rs:446-449)."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    return cell + (_lsb_col(cell) - F.lit(1))


def level_col(cell: Column | str) -> Column:
    """Cell level from trailing zeros: 30 - popcount(lsb-1)/2 (cellid.rs:245-247)."""
    cell = F.col(cell) if isinstance(cell, str) else cell
    return (F.lit(MAX_LEVEL) - (F.bit_count(_lsb_col(cell) - F.lit(1)) / F.lit(2))).cast("int")


def face_col(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftrightunsigned(cell, POS_BITS)


def is_valid_col(cell: Column | str) -> Column:
    cell = F.col(cell) if isinstance(cell, str) else cell
    face_ok = F.shiftrightunsigned(cell, POS_BITS) < F.lit(NUM_FACES)
    lsb_ok = _lsb_col(cell).bitwiseAND(F.lit(0x1555555555555555)) != F.lit(0)
    return face_ok & lsb_ok
