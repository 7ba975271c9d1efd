from datalake_etlscripts_spark.io.readers import (  # noqa: F401
    read_csv_dim,
    read_jsonl,
    read_mapping_tsv,
    read_parquet,
    read_table,
    read_tables,
    read_text_lines,
)
