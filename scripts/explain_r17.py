"""Capture `.explain("formatted")` for named registry queries into
plans/r17/<query>_<tag>.txt (the optimization-round evidence files).

Usage: python scripts/explain_r17.py <tag> <query> [query ...]
  e.g. python scripts/explain_r17.py before dedup_clusters
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_TWONN_PROBES", "64")

from dataingestionplayground_spark.plans import physical_plan  # noqa: E402
from dataingestionplayground_spark.queries import all_queries  # noqa: E402
from dataingestionplayground_spark.session import get_spark  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-r17", cpus=8)
    sf = "/root/testdata/sf0.1"
    reg = all_queries()
    for name in names:
        df = reg[name].fn(spark, sf)
        plan = physical_plan(df, "formatted")
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
