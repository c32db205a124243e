"""Capture .explain('formatted') for headline queries into plans/r11/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r11/<query>_<suffix>.txt for each named query (default:
every HEADLINE query in bench.py except the non-Spark codec
workloads). Plan capture only plans — nothing executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flytemosaic_spark.probes import all_probes  # noqa: E402
from flytemosaic_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    probes = all_probes()
    skip = {"cog_codec", "media_codec", "zstd_codec"}
    if not names:
        names = [n for n in bench.HEADLINE if n not in skip]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name in skip:
            continue
        fn = bench.flagship if name == "flagship" else probes[name].fn
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
