"""Structured-Streaming operators — importing populates the registry."""

from netcdf4_variable_streamer_spark.streaming import queries  # noqa: F401
