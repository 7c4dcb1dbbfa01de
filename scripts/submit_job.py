"""Cluster job entrypoint: spatial-join + tiling pipeline via spark-submit.

The deployment shape the engine is designed for (north rule: "run via
spark-submit --py-files on a multi-executor cluster"):

    python scripts/make_pyfiles.py
    spark-submit --py-files geomesa_spark.zip scripts/submit_job.py \
        --input /data/images --polygons /data/query_polys.wkt \
        --output /data/tiles --zooms 0 2 4 6 8

`--input` reads an image+caption table (parquet/Iceberg path with columns
image_id, lon, lat, ... per BASELINE.json input_hint); `--synthesize N`
generates the deterministic synthetic table instead (no external data —
the same generator the benchmarks use).  Master/executors/memory all come
from spark-submit, NOT from this script: the session builder only sets
job-level SQL conf, so the same file runs on local[N], YARN, or K8s
unchanged.

Output: a tile-pyramid parquet partitioned by zoom, plus a one-line JSON
metrics record on stdout (rows joined, pixels, seconds) in the same shape
bench.py emits — a cluster run is benchmarked with the exact code path the
local harness measures.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of the image+caption table")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate N synthetic rows instead of --input")
    ap.add_argument("--polygons",
                    help="WKT file: one `id<TAB>WKT` polygon per line "
                         "(default: 64 built-in demo circles)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--zooms", type=int, nargs="+", default=[0, 2, 4, 6, 8])
    ap.add_argument("--tile-px", type=int, default=256)
    args = ap.parse_args(argv)

    # spark-submit owns master/deploy-mode/memory; builder adds SQL conf only
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("geomesa-spark-tiling")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from geomesa_spark.operators.pip_join import pip_join_broadcast
    from geomesa_spark.operators.tiling import tile_pyramid

    if args.synthesize:
        from geomesa_spark.sources.images import synthetic_images_geo
        imgs = synthetic_images_geo(spark, args.synthesize,
                                    spark.sparkContext.defaultParallelism * 4)
    elif args.input:
        imgs = spark.read.parquet(args.input)
    else:
        print("one of --input / --synthesize is required", file=sys.stderr)
        return 2

    if args.polygons:
        with open(args.polygons) as fh:
            polys = [tuple(line.rstrip("\n").split("\t", 1))
                     for line in fh if line.strip()]
    else:
        import math
        polys = []
        for i in range(64):
            h = (i * 2654435761) % 4294967296
            cx = h / 4294967296 * 340 - 170
            cy = ((h * 31) % 4294967296) / 4294967296 * 160 - 80
            r = 6.0 + 3.0 * (i % 7)
            pts = [(cx + r * math.cos(2 * math.pi / 32 * k),
                    cy + r * math.sin(2 * math.pi / 32 * k))
                   for k in range(32)]
            pts.append(pts[0])
            polys.append((f"p{i}", "POLYGON ((" + ", ".join(
                f"{x:.6f} {y:.6f}" for x, y in pts) + "))"))

    t0 = time.time()
    joined = pip_join_broadcast(imgs, polys, lon_col="lon", lat_col="lat")
    tiles = tile_pyramid(joined, args.zooms, tile_px=args.tile_px)
    (tiles.write.mode("overwrite").partitionBy("zoom")
     .parquet(args.output))
    out = spark.read.parquet(args.output)
    n_px = out.count()
    took = round(time.time() - t0, 3)
    print(json.dumps({"metric": "submit_job_sec", "value": took,
                      "unit": "sec", "pyramid_pixels": n_px,
                      "zooms": args.zooms,
                      "parallelism": spark.sparkContext.defaultParallelism}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
