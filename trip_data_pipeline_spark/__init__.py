"""PySpark-native analytics engine with the query/data-processing
capabilities of CityOfPhiladelphia/trip-data-pipeline.

Provenance note (SURVEY.md §0): the reference checkout at /root/reference
was empty at survey time, so every operator here is specified by
SURVEY.md §2 (the binding operator inventory) rather than by reference
file:line citations.  Docstrings cite SURVEY.md §2 rows instead.

Architecture: DataFrame-first.  Every operator is a declarative logical
plan built with pyspark.sql — Catalyst/AQE pick the physical strategy.
Python UDFs appear only in the §2.10 UDF-surface operators (which exist
to cover that surface) and are Arrow-vectorized where possible.
"""

from trip_data_pipeline_spark.session import get_session
from trip_data_pipeline_spark.registry import OPS, queries, oracle_sql

__all__ = ["get_session", "OPS", "queries", "oracle_sql"]
