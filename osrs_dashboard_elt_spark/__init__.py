"""PySpark-native analytics engine with the capabilities of
Bourkies/OSRS-Dashboard-ELT, re-expressed Spark-first.

The reference (/root/reference, read-only) is a pandas/SQLite batch ETL
pipeline: Discord messages -> regex parse -> typed event tables -> ~25
report tables.  This package provides the same dataflow operators as
declarative Spark DataFrame plans designed for arbitrary scale:

- ``session``    SparkSession factory with scale-aware defaults (AQE, UTC).
- ``config``     typed config model (patterns, report specs, mapping rules).
- ``schema``     config-declared StructTypes for bronze/silver/gold tables.
- ``functions``  column-expression libraries (durations, text, temporal).
- ``operators``  reusable dataflow operators (as-of join, interval join,
                 top-n, resample+gap-fill, sessionize, dedup family,
                 similarity search, temporal remap, exclusion filters).
- ``plans``      config -> generated Column-expression DAGs (parse engine).
- ``reports``    the gold-layer report generators.
- ``streaming``  Structured Streaming variant of the ingest+parse path.
- ``multimodal`` binary-column (image/audio/video) plumbing with stubbed
                 decoders.
"""

__version__ = "0.1.0"
