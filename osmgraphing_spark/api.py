"""Library façade — the engine's equivalent of the reference's library API
(/root/reference/examples/dijkstra.rs:20-74: Config → parse_and_finalize →
compute), so "a user of the reference switches" with three lines:

    from osmgraphing_spark.api import LinkGraph
    g = LinkGraph.from_corpus(spark, corpus_df, reference_df)
    scores = g.pagerank()                    # (vid, rank) DataFrame

All heavy lifting stays in the operator modules; this is orchestration +
defaults only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import cc as _cc
from .operators import lpa as _lpa
from .operators import pagerank as _pagerank
from .operators import sssp as _sssp
from .operators import triangles as _triangles
from .operators.build import Graph, build_graph
from .operators.extract import extract_edges
from .plans.checkpoint import CheckpointManager
from .session import F64_ABS


@dataclass
class LinkGraph:
    graph: Graph
    checkpoint_root: str | None = None
    _managers: dict = field(default_factory=dict)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_corpus(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        reference_hashes: DataFrame | None = None,
        num_blocks: int = 32,
        checkpoint_root: str | None = None,
    ) -> "LinkGraph":
        """(repo, path, commit, lang, content) → built graph. Verifies the
        per-row sha256 invariant when a reference table is supplied."""
        raw = extract_edges(corpus, reference_hashes, verify=reference_hashes is not None)
        return cls(build_graph(raw, num_blocks=num_blocks), checkpoint_root)

    @classmethod
    def from_edges(
        cls, raw_edges: DataFrame, num_blocks: int = 32, checkpoint_root: str | None = None
    ) -> "LinkGraph":
        """(src_key, dst_key, weight) → built graph."""
        return cls(build_graph(raw_edges, num_blocks=num_blocks), checkpoint_root)

    @classmethod
    def load(cls, spark: SparkSession, base_dir: str, num_blocks: int = 32) -> "LinkGraph":
        from .sources.readers import load_prebuilt_graph

        return cls(load_prebuilt_graph(spark, base_dir, num_blocks))

    def save(self, base_dir: str) -> None:
        from .sources.writers import write_graph_tables

        write_graph_tables(self.graph, base_dir)

    # -- compute ------------------------------------------------------------

    def _ckpt(self, job: str) -> CheckpointManager | None:
        if self.checkpoint_root is None:
            return None
        if job not in self._managers:
            self._managers[job] = CheckpointManager(
                self.graph.edges.sparkSession, self.checkpoint_root, job
            )
        return self._managers[job]

    def pagerank(
        self,
        damping: float = 0.85,
        tol: float = F64_ABS,
        max_iter: int = 200,
        weighted: bool = False,
        mode: str = "dataframe",
        resume: bool = False,
        **kw,
    ) -> DataFrame:
        res = _pagerank.run(
            self.graph,
            damping=damping,
            tol=tol,
            max_iter=max_iter,
            weighted=weighted,
            mode=mode,
            checkpoint=self._ckpt("pagerank"),
            resume=resume,
            **kw,
        )
        return res.ranks

    def connected_components(self, resume: bool = False) -> DataFrame:
        return _cc.run(self.graph, checkpoint=self._ckpt("cc"), resume=resume)

    def label_propagation(self, max_iter: int = 20, resume: bool = False) -> DataFrame:
        return _lpa.run(
            self.graph, max_iter=max_iter, checkpoint=self._ckpt("lpa"), resume=resume
        )

    def sssp(
        self,
        source_keys: list[str],
        weighted: bool = True,
        max_iter: int = 100,
        resume: bool = False,
    ) -> DataFrame:
        """Multi-source shortest-path costs from the given external keys —
        the batched answer to the reference's point-to-point route queries.
        → (source, vid, dist); unreachable pairs absent."""
        vids = [
            r["vid"]
            for r in self.graph.vertices.where(
                self.graph.vertices["key"].isin(list(source_keys))
            ).collect()
        ]
        if not vids:
            raise ValueError(f"no vertices match source keys {source_keys!r}")
        return _sssp.run(
            self.graph, sources=vids, weighted=weighted, max_iter=max_iter,
            checkpoint=self._ckpt("sssp"), resume=resume,
        )

    def route_costs(self, pairs: DataFrame, weighted: bool = True) -> DataFrame:
        """(src, dst) vid pairs → (src, dst, cost), path-less pairs dropped
        (the reference route-generator's contract)."""
        return _sssp.route_costs(self.graph, pairs, weighted=weighted)

    def shortest_paths(self, pairs: DataFrame, weighted: bool = True) -> DataFrame:
        """(src, dst) vid pairs → (src, dst, cost, nodes array<long>): one
        shortest path's full node sequence per pair."""
        return _sssp.shortest_paths(self.graph, pairs, weighted=weighted)

    def write_smarts(self, pairs: DataFrame, path: str, weighted: bool = True) -> None:
        """Shortest paths for the pairs → SMARTS simulator XML route file."""
        from .sources.writers import write_smarts

        write_smarts(self.shortest_paths(pairs, weighted=weighted), path)

    def contract(self) -> tuple[DataFrame, DataFrame]:
        """Build a contraction hierarchy on the weighted edge table →
        (ch_edges (src, dst, w, via), levels (vid, level)); feed the pair
        to ``ch_route_costs`` / ``ch_shortest_paths`` for repeated
        point-query workloads (operators/ch.py — the accelerator the
        reference gets from its external CHConstructor)."""
        from pyspark.sql import functions as F

        from .operators import ch as _ch

        return _ch.contract_graph(
            self.graph.edges.select(
                "src", "dst", F.col("weight").alias("w")
            )
        )

    def ch_route_costs(
        self, ch_edges: DataFrame, levels: DataFrame, pairs: DataFrame
    ) -> DataFrame:
        """Batched CH point queries on a hierarchy from ``contract()`` →
        (src, dst, cost); per-batch cost independent of the pair count."""
        from .operators import ch as _ch

        return _ch.ch_route_costs(ch_edges, levels, pairs)

    def ch_shortest_paths(
        self, ch_edges: DataFrame, levels: DataFrame, pairs: DataFrame
    ) -> DataFrame:
        """Batched CH routes → (src, dst, cost, nodes array<long>), all
        shortcuts expanded back to original-graph hops."""
        from .operators import ch as _ch

        return _ch.ch_shortest_paths(ch_edges, levels, pairs)

    def generate_metrics(self, specs: list[dict]) -> "LinkGraph":
        """Apply a config-declared `generating:` list (copy / constant /
        convert / unit-aware calc) to the metric vector; a single-weight
        graph is vectorized to metrics=[weight] first."""
        from dataclasses import replace as _replace

        from .functions.generating import apply_generating

        g = apply_generating(self.graph.with_metric_vector(), specs)
        return _replace(self, graph=g)

    def scc(self) -> DataFrame:
        """Strongly connected components → (vid, scc): import-cycle groups."""
        from .operators import scc as _scc

        return _scc.run(self.graph)

    def build_order(self) -> DataFrame:
        """SCC condensation → topological layering → (scc, layer): a
        parallel build schedule over the import graph with cycles
        collapsed (equal layers are mutually independent)."""
        from pyspark.sql import functions as F

        from .operators import scc as _scc

        labels = _scc.run(self.graph).select(F.col("vid").alias("id"), "scc")
        cond = _scc.condensation(self.graph.edges.select("src", "dst"), labels)
        return _scc.toposort_layers(
            cond.select(F.col("scc_src").alias("src"), F.col("scc_dst").alias("dst")),
            vertices=labels.select(F.col("scc").alias("id")).distinct(),
        ).withColumnRenamed("id", "scc")

    def hits(self, max_iter: int = 20, tol: float = 1e-9) -> DataFrame:
        """HITS → (vid, hub, authority), L1-normalized."""
        from .operators import hits as _hits

        return _hits.run(self.graph, max_iter=max_iter, tol=tol)

    def salsa(self, max_iter: int = 20, tol: float = 1e-9) -> DataFrame:
        """SALSA (degree-normalized hubs/authorities, TKC-resistant) →
        (vid, hub, authority), L1-normalized."""
        from .operators import salsa as _salsa

        return _salsa.run(self.graph, max_iter=max_iter, tol=tol)

    def katz(self, **kw) -> DataFrame:
        """Katz centrality → (vid, katz)."""
        from .operators import katz as _katz

        return _katz.run(self.graph, **kw)

    def eigencentrality(self, **kw) -> DataFrame:
        """Eigenvector centrality (L1 power iteration) → (vid, score)."""
        from .operators import eigencentrality as _eigen

        return _eigen.run(self.graph, **kw)

    def coreness(self, **kw) -> DataFrame:
        """Full core decomposition → (vid, coreness)."""
        from .operators import kcore as _kcore

        return _kcore.coreness(self.graph, **kw)

    def truss(self, k: int, **kw) -> DataFrame:
        """k-truss (triangle-support peel) → surviving canonical edges
        (a, b, support) with support inside the surviving subgraph."""
        from .operators import truss as _truss

        return _truss.truss_edges(self.graph.edges, k, **kw)

    def betweenness(
        self,
        sources: list[int] | None = None,
        scale: bool = True,
        max_exact_sources: int | None = None,
        **kw,
    ) -> DataFrame:
        """Brandes betweenness → (vid, betweenness); ``sources=None`` uses
        every vertex as a pivot (exact — only sane on small graphs, so it
        refuses past ``max_exact_sources`` (default
        sssp.EXACT_SOURCE_CAP) like the other exact centralities; at
        scale pass a deterministic landmark sample and the n/k estimator
        normalization applies when ``scale``)."""
        from .operators import betweenness as _bt
        from .operators.sssp import EXACT_SOURCE_CAP, _exact_sources

        if sources is None:
            cap = EXACT_SOURCE_CAP if max_exact_sources is None else max_exact_sources
            sources = _exact_sources(self.graph, cap, "betweenness")
            scale = False
        return _bt.betweenness(
            self.graph.edges,
            sources,
            scale_to_n=self.graph.num_vertices if scale else None,
            **kw,
        )

    def louvain(self, **kw) -> DataFrame:
        """Louvain communities (modularity-maximizing) → (vid, label)."""
        from .operators import louvain as _louvain

        return _louvain.louvain(self.graph.edges, **kw).assignments

    def modularity(self, labels: DataFrame) -> DataFrame:
        """Newman modularity of a (vid, label) partition → per-community
        (label, intra_edges, degree_sum, q); total Q = sum(q)."""
        from .operators import graphstats as _gs

        return _gs.modularity(self.graph.edges, labels)

    def neighborhood_function(self, exact: bool = True, **kw) -> DataFrame:
        """Distance distribution N(t) → (t, pairs); ``exact=False`` uses
        the HyperANF HLL tier (the web-scale path)."""
        from .operators import neighborhood as _nb

        f = _nb.distance_distribution if exact else _nb.neighborhood_function_hll
        return f(self.graph.edges, **kw)

    def harmonic_centrality(
        self, sources: list[int] | None = None, weighted: bool = False
    ) -> DataFrame:
        """Inbound harmonic centrality (exact, or landmark-sampled via
        `sources`) → (vid, harmonic)."""
        return _sssp.harmonic_centrality(self.graph, sources=sources, weighted=weighted)

    def closeness_centrality(
        self, sources: list[int] | None = None, weighted: bool = False
    ) -> DataFrame:
        """Inbound closeness r(v)/Σd (exact, or landmark-sampled via
        `sources`) → (vid, n_reach, closeness)."""
        return _sssp.closeness_centrality(
            self.graph, sources=sources, weighted=weighted
        )

    def graph_stats(self) -> DataFrame:
        """One-row shape summary: edges, reciprocity, degree assortativity."""
        from .operators import graphstats as _gs

        e = self.graph.edges.select("src", "dst")
        return (
            _gs.reciprocity(e)
            .crossJoin(
                _gs.degree_assortativity(e).select("assortativity")
            )
        )

    def clustering_coefficients(self) -> DataFrame:
        """Per-vertex local clustering coefficients over the undirected view."""
        from .operators import graphstats as _gs

        return _gs.clustering_coefficients(self.graph.edges.select("src", "dst"))

    def triangle_count(self) -> int:
        return _triangles.count(self.graph)

    def triangles_per_vertex(self) -> DataFrame:
        return _triangles.per_vertex(self.graph)

    def degrees(self) -> DataFrame:
        return self.graph.out_degrees()

    def with_keys(self, df: DataFrame) -> DataFrame:
        """Attach the external vertex key to any (vid, ...) result."""
        return df.join(self.graph.vertices, "vid")
