from embulk_filter_copy_spark.fixtures.generator import (
    BASE_EPOCH,
    EVENT_SCHEMA,
    REPO_FILES_SCHEMA,
    gen_change_events,
    gen_repo_files,
)
from embulk_filter_copy_spark.fixtures.oracle import replay_oracle, table_digest_pdf

__all__ = [
    "gen_repo_files",
    "gen_change_events",
    "replay_oracle",
    "table_digest_pdf",
    "REPO_FILES_SCHEMA",
    "EVENT_SCHEMA",
    "BASE_EPOCH",
]
