"""lucene_spark — PySpark-native inverted-index build + BM25 query engine.

Public surface:

  operators.indexer.build_index   build / resume / append a (multi-field) index
  operators.merge.merge_index     full salted-by-term merge of all live units
  operators.merge.tiered_merge    one incremental tiered-merge step
  operators.search.Searcher       top-k BM25 + boolean/phrase/proximity/
                                  multi-term/term-in-set, field: scoping,
                                  cursor-pruned deep paging
  operators.join                  parent/child block join, query-time join
  operators.check.check_index     integrity audit
  operators.textops / multimodal / analytics / mlt / highlight / suggest
  streaming.nrt.stream_index      micro-batch NRT appends
  cli                             spark-submit entrypoint

Heavy imports stay in submodules: importing ``lucene_spark`` itself must be
cheap enough for executors unpickling UDF closures.
"""

__version__ = "0.1.0"
