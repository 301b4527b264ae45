"""Data-layout query surface: Z-order (Morton) clustering codes.

The write-side operator is :func:`operators.layout.zorder_write`; this
registry entry pins the CODE computation (the part both engines can
hash-match) — the file-level locality effect is asserted in
``tests/test_layout.py`` against real parquet output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.operators.layout import morton2, morton2_sql
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "layout_zorder_codes",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {morton2_sql('(l_partkey % 65536)', '(l_suppkey % 65536)')} AS zcode
    FROM lineitem
    """,
)
def layout_zorder_codes(spark, sf):
    # Morton interleave of (partkey, suppkey) per lineitem row — pure
    # in-row BIGINT shift/mask arithmetic, ZERO shuffles at any scale;
    # writers sort/range-partition by this code to get 2-d file locality
    # (operators/layout.py:zorder_write). Keys are quantized to 16 bits
    # with a modulus, part of the code's definition on both engines.
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        morton2("(l_partkey % 65536)", "(l_suppkey % 65536)").alias("zcode"),
    )
