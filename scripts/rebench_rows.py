"""Re-time specific bench rows at the big-block scales after a plan
change, using bench.py's own _bench_block (warm-up + min/median) and
the bench-exact probes — the adjudicate_weak_rows protocol, pointed at
an explicit row list.

Usage: python scripts/rebench_rows.py OUT.json row [row ...]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    out_path, rows = sys.argv[1], sys.argv[2:]
    os.chdir(REPO)
    from bench import _bench_block
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.session import get_spark
    from scripts.adjudicate_weak_rows import probes
    from scripts.make_bench_scale import build

    spark = get_spark("rebench")
    registry = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    doc = {"rows": rows, "probes": probes(spark), "blocks": {}}
    for name, copies in (("sf0.5", 5), ("sf1.0", 10)):
        d = str(REPO / ".benchdata" / name)
        if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
            build(spark, sf_dir, d, copies=copies)
        mins, meds = _bench_block(spark, registry, rows, d, n_runs=3)
        doc["blocks"][name] = {"min": mins, "median": meds}
    b1, b2 = doc["blocks"]["sf0.5"]["min"], doc["blocks"]["sf1.0"]["min"]
    doc["step_2x_min"] = {r: round(b2[r] / b1[r], 3) for r in rows if b1.get(r)}
    Path(out_path).write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc["blocks"], indent=1))
    print("2x steps:", doc["step_2x_min"])


if __name__ == "__main__":
    main()
