"""osmgraphing_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the reference
(Darksecond/osmgraphing: parse → build-graph → iterate-compute → write,
see /root/reference/src/network/graph/mod.rs and
/root/reference/src/bin/osmgraphing/balancing/mod.rs) as an idiomatic
Spark DataFrame pipeline:

- ``sources.synth``      deterministic source-code corpus generator
- ``operators.extract``  vectorized (Arrow) edge extraction from file content
- ``operators.build``    graph build: dense contiguous IDs, dedup, degrees,
                         src-hash partitioning, per-partition CSR blocks
- ``operators.pagerank`` PageRank (DataFrame joins + CSR SpMV fast path)
- ``operators.cc``       connected components (small-star / large-star)
- ``operators.lpa``      label propagation (deterministic min-label ties)
- ``operators.triangles``triangle counting (degree-ordered wedge join)
- ``plans.checkpoint``   per-superstep checkpoint/resume protocol
- ``functions``          text analysis / dedup / similarity for training-data
                         pipelines (documents & embeddings tables)
"""

__version__ = "0.1.0"
