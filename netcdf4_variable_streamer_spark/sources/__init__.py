"""Sources/sinks — importing registers the B-0 queries + the DataSource."""

from netcdf4_variable_streamer_spark.sources import queries  # noqa: F401
from netcdf4_variable_streamer_spark.sources.chunkstore import (  # noqa: F401
    ChunkStore,
    StreamedDataset,
    StreamedVariable,
)
from netcdf4_variable_streamer_spark.sources.netcdf_source import (  # noqa: F401
    NetCDFChunkDataSource,
)
