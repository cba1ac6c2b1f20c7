"""lucene_solr_spark — a PySpark-native full-text analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
Lucene/Solr reference (mrkarthik/lucene-solr, surveyed in SURVEY.md):
inverted-index construction, BM25 top-k search with block-max pruning,
and the Solr streaming-expression relational surface — re-expressed as
idiomatic Spark DataFrame plans plus vectorized Arrow UDFs.

Layout
------
- ``analysis``   : tokenization (StandardAnalyzer-subset semantics)
- ``functions``  : pure numpy math (SmallFloat norms, BM25 float pipeline)
- ``index``      : doc-id assignment, postings/dictionary/norms build,
                   posting-block codec, segment build + salted merge,
                   CheckIndex-style invariants, checkpoint/resume
- ``search``     : query spec, brute-force scorer (oracle path),
                   block-max WAND pruned scorer, top-k merge
- ``operators``  : Solr stream/facet analogs + training-data-pipeline ops
                   (dedup, similarity search, text analysis, multimodal)
- ``sources``    : readers/writers for the engine's tables
- ``streaming``  : TopicStream/DaemonStream analogs on Structured Streaming

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's publicly documented semantics.
"""

__version__ = "0.1.0"

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
