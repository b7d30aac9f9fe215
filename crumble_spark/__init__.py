"""crumble_spark — a from-scratch PySpark-native per-column lightweight
compression engine (dictionary, RLE, FSST-style gram tables, bit-packing,
frame-of-reference) with per-chunk cost-model codec auto-selection.

Spiritual graft of jkbonfield/crumble (see SURVEY.md): crumble's
classify-then-transform-with-verification loop over per-read quality byte
arrays (/root/reference/snp_score.c:1336-2029) becomes a per-block
codec-selection loop over token arrays, executed as Spark DataFrame ops +
vectorized Arrow/pandas UDFs.  Nothing here is a port — the reference is a
single-pass C pileup pipeline; this is a partition-parallel batch engine.
"""

__version__ = "0.1.0"

DEFAULT_BLOCK_SIZE = 1024
