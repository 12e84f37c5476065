"""osm_cut_spark — a PySpark-native OSM polygon-cutting and spatial-join engine.

Built from scratch with the query semantics of the reference Erlang extractor
(borovsky/osm-cut, studied at /root/reference) but an idiomatic Spark
architecture: interleaved text+media document tables, vectorized numpy/pandas
UDF geometry kernels, cell-indexed spatial pruning, broadcast/sort-merge
semi-joins, iterative closure joins, kNN and raster<->vector joins, and a
checkpoint/lineage layer for resumable jobs.

Nothing in this package is a translation of the reference's code; the
reference is cited in docstrings (file:line) purely to pin down *semantics*.
"""

__version__ = "0.1.0"
