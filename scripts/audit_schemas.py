"""Audit every registry query's output schema for driver-hashable types.

The driver's correctness harness canonicalizes results with pandas
(sort_values + factorize), which raises "unhashable type" on list/dict
cells. Every queries() entry must therefore expose only atomic columns
(string/numeric/bool/date/timestamp/binary-as-hex). This script builds
each DataFrame at sf0.001 (schema only — no job is run) and flags any
non-atomic output column.

Usage: python scripts/audit_schemas.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import types as T

ATOMIC = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType, T.BooleanType,
    T.DateType, T.TimestampType, T.TimestampNTZType,
)

BAD = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def main() -> int:
    import __spark_entry__ as entry

    from dataingestionplayground_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    bad = 0
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf)
        except Exception as e:  # noqa: BLE001
            print(f"BUILD-FAIL {name}: {e}")
            bad += 1
            continue
        flagged = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, BAD)
        ]
        if flagged:
            bad += 1
            print(f"NON-ATOMIC {name}: {flagged}")
    print(f"done: {len(qs)} queries, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
