"""lucene_spark — PySpark-native inverted-index build + BM25 query engine.

Public surface:

  operators.indexer.build_index   build / resume / append a segment index
  operators.merge.merge_index     global salted-by-term merge
  operators.search.Searcher       top-k BM25 + boolean/phrase/multi-term
  operators.check.check_index     integrity audit
  operators.textops / multimodal / analytics / mlt / highlight / suggest
  streaming.nrt.stream_index      micro-batch NRT appends
  cli                             spark-submit entrypoint

Heavy imports stay in submodules: importing ``lucene_spark`` itself must be
cheap enough for executors unpickling UDF closures.
"""

__version__ = "0.1.0"
