"""Profile one or more declared queries: wall time, job/stage counts,
and the top stages by duration with shuffle metrics.

Runs each query the way bench.py does (collect, then clearCache +
sweep), but in a session with the UI enabled, and scrapes the UI REST
API (localhost:40xx) for per-stage metrics — the guide §1.1 empirical
loop without a browser.

Usage:
    python tools/profile_query.py <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read().decode())


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as mod
    from bht_etl_app_spark import get_spark
    from bht_etl_app_spark.functions.lifecycle import sweep_checkpoints

    spark = get_spark("profile-query", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4055",
        "spark.ui.retainedStages": "5000",
        "spark.ui.retainedJobs": "5000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    qs = mod.queries()
    # warmup as bench.py does
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    for name in names:
        jobs_before = {j["jobId"] for j in _get(base, "/jobs")}
        stages_before = {s["stageId"] for s in _get(base, "/stages")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        sweep_checkpoints(spark.sparkContext)

        jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in jobs_before]
        stages = [
            s for s in _get(base, "/stages?status=complete")
            if s["stageId"] not in stages_before
        ]
        tot_stage_ms = sum(
            (s.get("executorRunTime") or 0) for s in stages
        )
        print(f"\n=== {name}: wall={wall:.2f}s rows={len(rows)} "
              f"jobs={len(jobs)} stages={len(stages)} "
              f"executorRunTime={tot_stage_ms/1000:.1f}s")
        top = sorted(
            stages,
            key=lambda s: -(s.get("executorRunTime") or 0),
        )[:14]
        for s in top:
            dur = (s.get("executorRunTime") or 0) / 1000
            sr = (s.get("shuffleReadBytes") or 0) / 1e6
            sw = (s.get("shuffleWriteBytes") or 0) / 1e6
            nt = s.get("numCompleteTasks") or s.get("numTasks")
            nm = (s.get("name") or "")[:60]
            desc = (s.get("description") or "")[:40]
            print(f"  stage {s['stageId']:>5} run={dur:7.2f}s tasks={nt:>4} "
                  f"shufR={sr:7.1f}MB shufW={sw:7.1f}MB {nm} {desc}")
        # SQL-node metrics: map hot stages back to operators. Each
        # executed plan's nodes carry "time in ..." metrics; print the
        # slowest nodes across this query's executions.
        try:
            execs = _get(base, "/sql?length=200")
        except Exception:
            execs = []
        nodes = []
        for e in execs:
            if f"profile:{name}" not in (e.get("description") or ""):
                continue
            for nd in e.get("nodes") or []:
                tot = 0
                label = ""
                for mt in nd.get("metrics") or []:
                    v = str(mt.get("value") or "")
                    if "time" in (mt.get("name") or ""):
                        # values like "1.2 m" / "34 s" / "456 ms" or
                        # "total (min, med, max)\n1.2 m (...)"
                        head = v.split("(")[0].strip().split("\n")[0]
                        try:
                            num, unit = head.split()[:2]
                            mult = {"ms": 1, "s": 1000, "m": 60000,
                                    "h": 3600000}.get(unit, 0)
                            tot += float(num) * mult
                        except Exception:
                            pass
                    if mt.get("name") == "number of output rows":
                        label = f"rows={v.splitlines()[0]}"
                nodes.append((tot, nd.get("nodeName"), label, e.get("id")))
        for tot, nm2, label, eid in sorted(nodes, reverse=True)[:20]:
            if tot <= 0:
                break
            print(f"  sqlnode {tot/1000:8.1f}s  {nm2[:70]} {label} exec={eid}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
