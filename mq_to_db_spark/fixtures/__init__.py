from mq_to_db_spark.fixtures.generator import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pdf,
    inject_dirty_rows,
    write_transcripts_parquet,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "generate_transcripts_pdf",
    "inject_dirty_rows",
    "write_transcripts_parquet",
]
