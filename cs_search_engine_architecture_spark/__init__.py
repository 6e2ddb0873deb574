"""spark-sea: a PySpark-native distributed inverted-index + BM25 engine.

From-scratch rebuild of the capabilities of the single-node Cython engine
``vincenteichhorn/cs-search-engine-architecture`` (read-only reference at
/root/reference; structural analysis in SURVEY.md). All heavy dataflow is
expressed with the DataFrame API + vectorized Arrow/pandas UDFs; nothing in
this package ports the reference's execution machinery.
"""

__version__ = "0.1.0"
