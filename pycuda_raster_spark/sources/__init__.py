"""Sources & sinks: parquet/binary-file image readers, ESRI ASCII Grid
parser, and the Iceberg-shaped partitioned-parquet catalog (SURVEY.md §2.1)."""
