"""Per-job/stage profiler for a single declared query.

Usage: python tools/profile_query.py <sf_dir> <query> [passes]

Runs the query with the bench's noop-sink methodology (one warm pass,
then timed passes) and prints per-job wall times from the status
tracker plus stage-level task-time attribution, so optimization work
targets the stage that actually burns the time instead of the plan
that merely looks heavy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from xorq_spark.session import connect
    from xorq_spark.queries import QUERIES

    spark = connect(
        master=f"local[{cpus}]",
        app_name="profile_query",
        extra_conf={"spark.driver.memory": "24g",
                    "spark.python.worker.reuse": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    fn = QUERIES[name]

    def run():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    def unpersist():
        try:
            it = sc._jsc.sc().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:
            pass

    run()  # warm
    unpersist()
    st = sc.statusTracker()
    for p in range(passes):
        before_jobs = set(st.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"{name} pass {p}")
        t0 = time.time()
        run()
        wall = time.time() - t0
        time.sleep(0.3)
        jobs = sorted(set(st.getJobIdsForGroup(None) or []) - before_jobs)
        print(f"\n=== pass {p}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        jtrack = sc._jsc.sc().jobProgressListener() if False else None  # noqa
        appid = sc.applicationId
        import urllib.request, json  # noqa: E401
        ui = sc.uiWebUrl
        for jid in jobs:
            try:
                j = json.load(urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{appid}/jobs/{jid}"))
            except Exception as e:
                print(f"  job {jid}: (api err {e})")
                continue
            sub = j.get("submissionTime", "?")[-12:-3]
            dur = "?"
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime
                f_ = "%Y-%m-%dT%H:%M:%S.%f"
                dur = (datetime.strptime(j["completionTime"][:-3], f_)
                       - datetime.strptime(j["submissionTime"][:-3], f_)
                       ).total_seconds()
                dur = f"{dur:7.3f}s"
            print(f"  job {jid} {dur} sub@{sub} stages={j['stageIds']}")
            for sid in sorted(j["stageIds"]):
                try:
                    ss = json.load(urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{appid}/stages/{sid}"))
                except Exception:
                    continue
                for s in ss:
                    if s["status"] == "SKIPPED":
                        continue
                    print(
                        f"    stage {sid} {s['status']:9s} tasks={s['numCompleteTasks']:4d} "
                        f"exec_ms={s.get('executorRunTime',0):7d} "
                        f"cpu_ms={s.get('executorCpuTime',0)//1_000_000:7d} "
                        f"shuffleR={s.get('shuffleReadBytes',0)//1024:8d}K "
                        f"shuffleW={s.get('shuffleWriteBytes',0)//1024:8d}K "
                        f"in={s.get('inputBytes',0)//1024:8d}K "
                        f"{s.get('name','')[:70]}"
                    )
        unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
