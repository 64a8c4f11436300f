"""Sources & sinks: synthetic corpus generation, warehouse (parquet/Iceberg)
table IO, checkpoint/resume, lineage metrics, and driver testdata loaders."""
