"""Operator modules — importing this package registers every operator
from SURVEY.md §2 into trip_data_pipeline_spark.registry.OPS."""

from trip_data_pipeline_spark.operators import (  # noqa: F401
    aggregates,
    behavior,
    composite,
    composite2,
    composite3,
    dedup,
    extras,
    filters,
    graph,
    joins,
    lifecycle,
    mlprep,
    multimodal,
    scalar_funcs,
    scans,
    sessionize,
    setops,
    similarity,
    sorting,
    streaming_ops,
    text_ops,
    udfs,
    windows,
)
