"""Operator catalog — importing this package populates the registry."""

from netcdf4_variable_streamer_spark.operators import (  # noqa: F401
    aggregates,
    corpus,
    dedup,
    eventflow,
    graph,
    joins,
    multimodal,
    packing,
    profiling,
    projection,
    quality,
    reports,
    scalar_functions,
    setops,
    similarity,
    subqueries,
    text,
    udfs,
    windows,
)
