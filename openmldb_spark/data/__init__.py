from openmldb_spark.data.transcripts import (
    generate_transcripts,
    generate_conv_meta,
    generate_archive,
)

__all__ = ["generate_transcripts", "generate_conv_meta", "generate_archive"]
