"""Operator catalog — importing this package populates the registry."""

from netcdf4_variable_streamer_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    graph,
    joins,
    multimodal,
    packing,
    projection,
    scalar_functions,
    setops,
    similarity,
    subqueries,
    text,
    udfs,
    windows,
)
