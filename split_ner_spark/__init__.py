"""split_ner_spark — PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the computational semantics of c3sr/split-ner
(SplitNER, ACL 2023) as an idiomatic Spark DataFrame pipeline:

    pages (Common-Crawl-style)            [corpus.py]
      -> extract_text + segment + tokenize  [ops/segment.py]   UDF #1
      -> span detection (BIOES)             [ops/detect.py]    UDF #2
      -> span assembly (W3 sessionization)  [ops/assemble.py]  Catalyst
      -> span classification (typing)       [ops/classify.py]  UDF #3
      -> entity linking (broadcast + LSH)   [ops/link.py]
      -> canonicalization (conn. comps)     [ops/canon.py]
      -> triple materialization (salted)    [ops/triples.py]
      -> evaluation (F1, overlap, OOV...)   [ops/metrics.py]   Catalyst

Everything here derives from the public PySpark API and the reference repo
at /root/reference (structure documented in /root/repo/SURVEY.md). It is a
re-expression of the reference's dataflow on Spark, not a port of its
PyTorch execution engine.
"""

__version__ = "0.1.0"
