"""Time a subset of probes in isolation — bench.py methodology
(one untimed warm run, then best-of-3 with the noop sink) without
paying for the whole 85-query sweep. The r11 measure-first loop.

Usage: python tools/time_probes.py [probe ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), TIME_PROBES_RUNS (default 3).
Always re-times flagship first and last so host state brackets the
numbers (read RATIOS against flagship, not absolutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flytemosaic_spark.probes import all_probes  # noqa: E402
from flytemosaic_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("TIME_PROBES_RUNS", "3"))
    names = sys.argv[1:]
    spark = get_spark("time_probes")
    spark.sparkContext.setLogLevel("ERROR")
    probes = all_probes()

    def t(fn) -> float:
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # the first queries of a fresh session pay a multi-second JIT
    # warm-up gradient on this host — run flagship until two
    # consecutive runs agree within 15% before measuring anything
    prev = t(bench.flagship)
    for _ in range(8):
        cur = t(bench.flagship)
        done = cur >= prev * 0.85
        prev = cur
        if done:
            break

    out: dict[str, float] = {"flagship@start": prev}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        out[name] = t(bench.flagship if name == "flagship" else probes[name].fn)
        spark.sparkContext.setJobDescription(None)
    out["flagship@end"] = t(bench.flagship)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
