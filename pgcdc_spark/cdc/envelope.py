"""pgoutput-shaped CDC envelope: schema + checked parse.

Mirrors the wire format the reference consumes (wal2json / pgoutput via
pg-logical-replication — reference src/database/postgresql/
PostgresLogicalPg.ts:21, src/config/config.ts:21-24) and the `students`
row image (terraform/setup_database.sql:8-15; the camelCase io-ts model at
src/model/student.ts:3-9 is the reference's bug — wire snake_case wins,
SURVEY.md §1.4).

Parsing uses ``from_json`` with an explicit schema: malformed payloads
become NULL images instead of corrupt rows (vs the reference's unchecked
``as Student`` cast, src/mapping/customMapper.ts:22), and the raw line is
kept in a dead-letter column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Row image of the reference's `students` table (snake_case wire format).
STUDENT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("date_of_birth", DateType()),
        StructField("status_id", IntegerType()),
    ]
)

# One wal message (FIXTURES.md A3): lsn orders events; tag is the message
# kind; new/old are the row images (new for insert/update, old for delete).
def envelope_schema(row_schema: StructType = STUDENT_SCHEMA) -> StructType:
    return StructType(
        [
            StructField("lsn", StringType()),
            StructField("tag", StringType()),
            StructField("new", row_schema),
            StructField("old", row_schema),
        ]
    )


def parse_envelope(raw: DataFrame, json_col: str = "value",
                   row_schema: StructType = STUDENT_SCHEMA) -> DataFrame:
    """Parse raw JSON lines into envelope columns + `_corrupt` dead letter.

    PERMISSIVE mode returns an all-null struct (not a NULL struct) for
    malformed text, so dead-lettering must go through
    ``columnNameOfCorruptRecord``, which captures the raw line.
    """
    schema = envelope_schema(row_schema).add(StructField("_corrupt", StringType()))
    parsed = raw.withColumn(
        "_env",
        F.from_json(
            F.col(json_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return parsed.select(
        F.col("_env.lsn").alias("lsn"),
        F.col("_env.tag").alias("tag"),
        F.col("_env.new").alias("new"),
        F.col("_env.old").alias("old"),
        F.col("_env._corrupt").alias("_corrupt"),
    )
