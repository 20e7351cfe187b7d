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
    ap.add_argument(
        "--salt", default="0",
        help="PageRank skew handling: an int for the fixed two-stage gather "
        "salt, or 'auto' to measure the resting layout and split hub-source "
        "edge blocks (pagerank._auto_salt_plan)",
    )
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
    ap.add_argument(
        "--pin-cores", default=None,
        help="'0-7': core range this job is pinned to; the timed section "
        "samples /proc/stat for those cores and reports steal_pct — this "
        "box is a VM on a shared host, and a trial measured while the host "
        "steals CPU is not evidence about the engine",
    )
    ap.add_argument(
        "--event-log-dir", default=None,
        help="when set, Spark event logging is enabled there and the timed "
        "section's per-task metrics (executor run/CPU/GC time, shuffle "
        "bytes, spill) are aggregated into the output JSON. Executor "
        "CPU-seconds per superstep is the noise-robust scaling invariant: "
        "wall-clock on a shared-host VM swings with co-tenant weather, but "
        "if total CPU work stays flat from N to 4N cores the engine adds "
        "no parallel overhead.",
    )
    args = ap.parse_args()

    from .operators import pagerank
    from .operators.build import build_graph
    from .session import get_spark
    from .sources.readers import load_prebuilt_graph

    extra = {}
    if args.local_dir:
        extra["spark.local.dir"] = args.local_dir
    if args.event_log_dir:
        import os as _os

        _os.makedirs(args.event_log_dir, exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = "file://" + args.event_log_dir
        extra["spark.eventLog.compress"] = "false"
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

    def read_pinned_cores():
        if not args.pin_cores:
            return None
        lo, hi = (int(x) for x in args.pin_cores.split("-"))
        cores = set(range(lo, hi + 1))
        acc = {"busy": 0, "idle": 0, "steal": 0, "total": 0}
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith("cpu") and line[3:4].isdigit():
                    f = line.split()
                    if int(f[0][3:]) in cores:
                        v = list(map(int, f[1:]))
                        acc["busy"] += v[0] + v[1] + v[2]
                        acc["idle"] += v[3]
                        acc["steal"] += v[7] if len(v) > 7 else 0
                        acc["total"] += sum(v)
        return acc

    salt: int | str = args.salt if args.salt == "auto" else int(args.salt)

    if args.warmup_iters > 0:
        pagerank.run(
            g,
            mode=args.mode,
            tol=0.0,
            max_iter=args.warmup_iters,
            check_every=args.warmup_iters,
            salt=salt,
        )

    def membw_probe() -> float:
        """Single-thread DRAM streaming rate (GB/s), the host-weather
        signal /proc/stat cannot see: co-tenant VMs saturating the shared
        memory bus stall cores that still count as 'busy'. A wide leg needs
        proportionally more bandwidth than a narrow one, so pairs timed
        under depressed bandwidth are flagged in the report."""
        import numpy as _np
        import time as _t

        a = _np.ones(32 * 1024 * 1024, dtype=_np.float64)  # 256 MB
        best = 0.0
        for _ in range(3):
            t0 = _t.time()
            b = a.copy()
            dt = _t.time() - t0
            best = max(best, 2 * a.nbytes / dt / 1e9)
            del b
        return round(best, 2)

    membw = membw_probe()
    cpu0 = read_pinned_cores()
    timed_start_ms = int(time.time() * 1000)
    res = pagerank.run(
        g,
        mode=args.mode,
        tol=args.tol,
        max_iter=args.max_iter,
        check_every=args.check_every,
        salt=salt,
    )
    cpu1 = read_pinned_cores()
    steal_pct = busy_pct = None
    if cpu0 is not None:
        d_tot = max(cpu1["total"] - cpu0["total"], 1)
        steal_pct = round(100.0 * (cpu1["steal"] - cpu0["steal"]) / d_tot, 1)
        busy_pct = round(100.0 * (cpu1["busy"] - cpu0["busy"]) / d_tot, 1)
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
        "salt_k": res.salt_k,
        "hot_srcs": res.hot_srcs,
        "steal_pct": steal_pct,
        "busy_pct": busy_pct,
        "membw_gbps": membw,
    }
    app_id = spark.sparkContext.applicationId
    spark.stop()
    if args.event_log_dir:
        out.update(_parse_event_log(args.event_log_dir, app_id, timed_start_ms))
    print(json.dumps(out))
    sys.stdout.flush()


def _parse_event_log(log_dir: str, app_id: str, since_ms: int) -> dict:
    """Aggregate per-task metrics for tasks launched after ``since_ms``
    (i.e. the timed PageRank section, excluding build + warmup) from the
    Spark event log. Pure post-hoc JSON parse — zero overhead during the
    timed section."""
    import os

    # Spark 4 rolling layout: <dir>/eventlog_v2_<appId>/events_*_<appId>;
    # classic layout: <dir>/<appId> single file.
    paths = []
    for cand in (os.path.join(log_dir, f"eventlog_v2_{app_id}"),
                 os.path.join(log_dir, app_id)):
        if os.path.isdir(cand):
            paths = sorted(
                os.path.join(cand, f)
                for f in os.listdir(cand)
                if f.startswith("events_")
            )
            break
        if os.path.isfile(cand):
            paths = [cand]
            break
    if not paths:
        return {}
    agg = {
        "task_run_sec": 0.0,   # executor run time (wall inside tasks)
        "task_cpu_sec": 0.0,   # executor CPU time (on-CPU)
        "gc_sec": 0.0,
        "shuffle_write_gb": 0.0,
        "shuffle_read_gb": 0.0,
        "spill_gb": 0.0,
        "n_tasks": 0,
        # straggler evidence: the single largest task of the timed section
        # (an unsplittable skewed block shows up here, not in the sums)
        "max_task_sec": 0.0,
    }
    for path in paths:
        with open(path) as fh:
            _agg_task_lines(fh, since_ms, agg)
    return {k: (round(v, 2) if isinstance(v, float) else v) for k, v in agg.items()}


def _agg_task_lines(fh, since_ms: int, agg: dict) -> None:
    for line in fh:
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            ti = ev.get("Task Info") or {}
            if (ti.get("Launch Time") or 0) < since_ms:
                continue
            tm = ev.get("Task Metrics") or {}
            agg["n_tasks"] += 1
            rt = (tm.get("Executor Run Time") or 0) / 1e3
            agg["task_run_sec"] += rt
            agg["max_task_sec"] = max(agg["max_task_sec"], rt)
            agg["task_cpu_sec"] += (tm.get("Executor CPU Time") or 0) / 1e9
            agg["gc_sec"] += (tm.get("JVM GC Time") or 0) / 1e3
            sw = tm.get("Shuffle Write Metrics") or {}
            agg["shuffle_write_gb"] += (sw.get("Shuffle Bytes Written") or 0) / 1e9
            sr = tm.get("Shuffle Read Metrics") or {}
            agg["shuffle_read_gb"] += (
                (sr.get("Local Bytes Read") or 0) + (sr.get("Remote Bytes Read") or 0)
            ) / 1e9
            agg["spill_gb"] += (
                (tm.get("Memory Bytes Spilled") or 0)
                + (tm.get("Disk Bytes Spilled") or 0)
            ) / 1e9


if __name__ == "__main__":
    main()
