"""[R] scalar decode functions re-expressed as Spark expressions.

The reference formats raw ETW values during projection
(``/root/reference/src/main.cpp:524-819``): GUIDs to canonical
strings (``329-337``), FILETIME ticks to timestamps (``143, 402``),
integers to hex (HEXINT32/64, ``215-217``). These are the same
functions our engine exposes, as pure JVM-side column expressions —
no UDFs, codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# FILETIME epoch (1601-01-01) to Unix epoch (1970-01-01), in seconds.
FILETIME_EPOCH_OFFSET_S = 11_644_473_600


def guid_str(bin16: Column) -> Column:
    """Format 16 raw bytes as a canonical lowercase GUID string
    ``xxxxxxxx-xxxx-xxxx-xxxx-xxxxxxxxxxxx`` (the reference's
    GuidToString, ``src/main.cpp:329-337``; big-endian hex form)."""
    h = F.lower(F.hex(bin16))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def filetime_to_timestamp(ticks: Column) -> Column:
    """FILETIME (100ns ticks since 1601-01-01, the reference's raw
    timestamp unit, ``src/main.cpp:143``) → TimestampType (µs).

    Exact arithmetic only: a double division would lose precision on
    ~1.3e17-tick values (53-bit mantissa), so the /10 runs in decimal.
    Spark timestamps are µs so the 100ns sub-unit is floored, matching
    every µs-resolution consumer."""
    us_since_1601 = F.floor(ticks.cast("decimal(38,0)") / 10).cast("long")
    return F.timestamp_micros(
        us_since_1601 - F.lit(FILETIME_EPOCH_OFFSET_S * 1_000_000)
    )


def timestamp_to_filetime(ts: Column) -> Column:
    """Inverse of ``filetime_to_timestamp`` (µs precision)."""
    return (
        F.unix_micros(ts) + F.lit(FILETIME_EPOCH_OFFSET_S * 1_000_000)
    ) * 10


def hexint(col: Column, width: int = 8) -> Column:
    """HEXINT32/64 display form: ``0x`` + zero-padded lowercase hex
    (``src/main.cpp:215-217``). Values wider than ``width`` hex digits
    keep their full representation (lpad alone would truncate them to
    the leftmost chars, silently corrupting e.g. a >32-bit long at the
    default width)."""
    h = F.lower(F.hex(col))
    padded = F.when(F.length(h) < width, F.lpad(h, width, "0")).otherwise(h)
    return F.concat(F.lit("0x"), padded)
