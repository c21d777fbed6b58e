"""Isolated per-query probe: fresh tuned JVM, median-of-N noop-forced
runs per query, with the bench's calibration probes bracketing the
block so ambient host drift is visible next to every number.

Usage:
    python tools/qbench.py [--plans DIR] [--runs N] <sf_dir> name [name ...]

With --plans DIR, also writes DIR/<name>.txt containing the
explain("formatted") output of each query (the plan-shape evidence the
optimization rounds commit under plans/r15/).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    runs_n = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir, names = args[0], args[1:]

    from bench import calibrate, calibrate_mem, force
    from bpaotu_spark.session import get_session
    from bpaotu_spark import registry

    registry.load_all()
    spark = get_session("qbench")

    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # same warm-up discipline as bench.py
    force(registry.QUERIES[names[0]](spark, sf_dir))
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    calib0 = calibrate(spark)
    calib_mem0 = calibrate_mem(spark)

    out: dict[str, dict] = {}
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        rs = []
        for _ in range(runs_n):
            t0 = time.time()
            force(registry.QUERIES[name](spark, sf_dir))
            rs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(rs)[len(rs) // 2], "runs": rs}

    calib1 = calibrate(spark)
    calib_mem1 = calibrate_mem(spark)
    print(json.dumps({
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "calib": [calib0, calib1],
        "calib_mem": [calib_mem0, calib_mem1],
        "queries": out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
