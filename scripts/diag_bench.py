#!/usr/bin/env python
"""Diagnostic bench: per-rep per-query timings + JVM code-cache / GC /
python-worker telemetry, to localize cumulative session-state degradation
(bench.py shows queries slowing 3-4x late in the 50-query session that are
1-1.5s in a fresh JVM)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from geomesa_spark.session import get_spark
spark = get_spark("diag-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
jvm = spark.sparkContext._jvm

def jvm_stats():
    out = {}
    for pool in jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans():
        n = pool.getName()
        if "CodeHeap" in n or "Metaspace" in n:
            u = pool.getUsage()
            out[n] = round(u.getUsed() / 1e6, 1)
    gc_ms = 0
    for g in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans():
        gc_ms += g.getCollectionTime()
    out["gc_ms_total"] = gc_ms
    heap = jvm.java.lang.management.ManagementFactory.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = round(heap.getUsed() / 1e6)
    return out

import __spark_entry__ as em
qs = em.queries()
rows = []
t_session = time.time()
for name in sorted(qs):
    reps = []
    for _ in range(2):
        jvm.System.gc()
        t0 = time.time()
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        reps.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    st = jvm_stats()
    rows.append({"q": name, "reps": reps, **st,
                 "t_session": round(time.time() - t_session, 1)})
    print(json.dumps(rows[-1]), flush=True)
json.dump(rows, open("/tmp/diag_bench.json", "w"), indent=1)
spark.stop()
