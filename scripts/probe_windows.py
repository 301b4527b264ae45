"""Ad-hoc probe: time window_range_frame / window_ntile_buckets /
sample_token_budget at sf0.5 and sf1.0 to reproduce the r9 verdict's
scaling flag before and after the rewrite. Not part of the bench
protocol — dev diagnostics only."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataingestionplayground_spark.queries import all_queries  # noqa: E402
from dataingestionplayground_spark.session import get_spark  # noqa: E402

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "window_range_frame",
    "window_ntile_buckets",
    "sample_token_budget",
]
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("probe")
reg = all_queries()
base = Path(__file__).resolve().parent.parent / ".benchdata"
for name in NAMES:
    fn = reg[name].fn
    for sf_dir in (str(base / "sf0.5"), str(base / "sf1.0")):
        samples = []
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name} {Path(sf_dir).name}: min={min(samples)} all={samples}", flush=True)
