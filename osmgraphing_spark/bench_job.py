"""Single benchmark job, run in its OWN process/JVM so parallelism levels
don't contaminate each other (the scaling-efficiency evidence requires a
clean `local[8]` vs `local[32]` comparison on the same input).

Usage:
    python -m osmgraphing_spark.bench_job --master local[8] \
        --edges /path/raw_edges.parquet [--mode csr] [--max-iter 50]

Prints one JSON line:
    {"master": ..., "build_sec": ..., "pagerank_sec": ..., "iterations": ...,
     "edges": ..., "edges_per_sec": ..., "supersteps_per_hour": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True)
    ap.add_argument("--edges", help="raw_edges parquet dir (runs the full build)")
    ap.add_argument("--prebuilt", help="prebuilt graph dir (skips the build)")
    ap.add_argument("--mode", default="dataframe", choices=["dataframe", "csr"])
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--check-every", type=int, default=10)
    ap.add_argument("--num-blocks", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument(
        "--warmup-iters", type=int, default=0,
        help="untimed PageRank supersteps run first (JIT/page-cache warmup); "
        "the timed run starts from fresh uniform ranks afterwards",
    )
    ap.add_argument(
        "--driver-mem", default=None,
        help="JVM heap; the scaling legs hold memory PER CORE constant "
        "(executors bring their own memory, so total memory scales with N)",
    )
    ap.add_argument(
        "--local-dir", default=None,
        help="spark.local.dir for shuffle spill; the scaling legs point this "
        "at tmpfs so per-leg shuffle bandwidth is not bottlenecked by one "
        "shared container disk (executors bring their own SSDs)",
    )
    args = ap.parse_args()

    from .operators import pagerank
    from .operators.build import build_graph
    from .session import get_spark
    from .sources.readers import load_prebuilt_graph

    extra = {}
    if args.local_dir:
        extra["spark.local.dir"] = args.local_dir
    if args.driver_mem:
        import os

        os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.driver_mem
    spark = get_spark(
        app_name=f"bench-{args.master}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if args.prebuilt:
        g = load_prebuilt_graph(spark, args.prebuilt, num_blocks=args.num_blocks)
    else:
        g = build_graph(
            spark.read.parquet(args.edges), num_blocks=args.num_blocks
        )
    build_sec = time.time() - t0

    if args.warmup_iters > 0:
        pagerank.run(
            g,
            mode=args.mode,
            tol=0.0,
            max_iter=args.warmup_iters,
            check_every=args.warmup_iters,
        )

    res = pagerank.run(
        g,
        mode=args.mode,
        tol=args.tol,
        max_iter=args.max_iter,
        check_every=args.check_every,
    )
    iters = res.iterations
    out = {
        "master": args.master,
        "mode": args.mode,
        "build_sec": round(build_sec, 2),
        "pagerank_sec": round(res.wall_sec, 2),
        "iterations": iters,
        "converged": res.converged,
        "final_delta": res.deltas[-1] if res.deltas else None,
        "vertices": g.num_vertices,
        "edges": g.num_edges,
        "edges_per_sec": round(res.edges_processed / max(res.wall_sec, 1e-9), 1),
        "supersteps_per_hour": round(3600.0 * iters / max(res.wall_sec, 1e-9), 1),
    }
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
