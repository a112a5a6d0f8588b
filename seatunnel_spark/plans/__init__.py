from seatunnel_spark.plans.catalog import (
    DataSaveMode,
    FileCatalog,
    SchemaSaveMode,
    diff_schemas,
    evolve_dataframe,
)

__all__ = [
    "DataSaveMode", "FileCatalog", "SchemaSaveMode",
    "diff_schemas", "evolve_dataframe",
]
