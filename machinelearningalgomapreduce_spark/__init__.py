"""PySpark-native analytics engine with the query/data-processing surface of
``myarycn/MachineLearningAlgoMapReduce`` (a Hadoop-MapReduce ML library),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

NOTE on reference citations: ``/root/reference`` is empty in this environment
(verified in SURVEY.md §0), so docstrings cite the *driver contract files*
(SURVEY.md / BASELINE.json / FIXTURES.md in the repo root) instead of
reference file:line. The reference's surface is reconstructed in SURVEY.md §2.

Layout:
    sources/    — table schemas + loaders (Parquet scan layer)
    operators/  — the query surface (relational, ML, LLM-ops, events)
    functions/  — reusable column expressions (vector math, hashing, UDFs)
    plans/      — physical-plan inspection (pushdown/broadcast/shuffle checks)
    streaming/  — Structured Streaming wrappers over the batch operators
    multimodal/ — binary-column (image/audio) plumbing with stubbed decoders
    registry.py — assembles queries() / oracle_sql() for the driver harness
"""

from machinelearningalgomapreduce_spark.session import get_spark  # noqa: F401
from machinelearningalgomapreduce_spark.sources.catalog import load_tables  # noqa: F401

__version__ = "0.1.0"
