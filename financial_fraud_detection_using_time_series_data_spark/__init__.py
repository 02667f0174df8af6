"""spark-fraud-engine: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference fraud-detection pipeline
(ARYA-5012/Financial-Fraud-Detection-Using-Time-Series-Data), re-expressed
Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (local + cluster-ready configs)
- ``sources``    : scans/sinks (parquet/csv), synthetic generator, profiler
- ``functions``  : pandas-parity scalar expression library (exprs)
- ``operators``  : relational / window / evaluation / dedup / similarity / text
- ``plans``      : composed pipelines (fraud feature engineering end-to-end)
- ``ml``         : MLlib pipeline (weighted GBT, stacking, threshold eval)
- ``streaming``  : Structured Streaming scoring surface

Everything is lazy DataFrame composition: Catalyst provides the
analyze/optimize/plan phases the reference (an eager pandas program) lacks.
"""

__version__ = "0.1.0"
