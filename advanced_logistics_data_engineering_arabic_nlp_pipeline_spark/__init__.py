"""PySpark-native analytics engine with the query/data-processing
capabilities of GlitchKr/Advanced-Logistics-Data-Engineering-Arabic-NLP-Pipeline,
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured Streaming).

Layout
------
- ``session``    : SparkSession factory tuned for the driver harness.
- ``sources``    : parquet/json/dictionary sources and landing-dir ingestion.
- ``functions``  : pure Column-expression function library (coercions, scalar
                   derivations, Arabic/EN normalization — SURVEY.md §2 B/C/D).
- ``operators``  : composite operators (3-tier dictionary lookup join,
                   extraction/classification, array ops, aggregations, dedup,
                   similarity search, text analysis — §2 E/F/G/H/M).
- ``plans``      : end-to-end pipelines (the reference's master/pairs/stats/
                   multi-details analytics, relational benchmark queries).
- ``streaming``  : Structured Streaming counterparts (§2 L).

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior (cited by file:line in docstrings).
"""

__version__ = "0.1.0"
