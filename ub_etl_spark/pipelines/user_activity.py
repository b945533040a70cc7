"""User-activity upsert pipeline — the reference's second job
(scripts/user_course_activity.py) as Spark transformations.

Flat 22-column documents -> typed fact rows -> latest-wins merge keyed on
(user_id, course_id) (conflict target scripts/user_course_activity.py:81,
UNIQUE constraint user_course_activity_database.sql:24).  ISO-8601 'Z'
timestamps parse via to_timestamp under a UTC session (A12,
scripts/user_course_activity.py:181-185) with null-through semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ub_etl_spark.operators.merge import upsert_latest_wins

RAW_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("user_surname", T.StringType(), True),
        T.StructField("user_email", T.StringType(), True),
        T.StructField("user_role", T.StringType(), True),
        T.StructField("user_external_id", T.StringType(), True),
        T.StructField("course_id", T.LongType(), False),
        T.StructField("course_title", T.StringType(), True),
        T.StructField("course_category", T.StringType(), True),
        T.StructField("course_duration", T.DoubleType(), True),
        T.StructField("completion_ratio", T.DoubleType(), True),
        T.StructField("num_video_consumed_minutes", T.DoubleType(), True),
        T.StructField("course_enroll_date", T.StringType(), True),
        T.StructField("course_start_date", T.StringType(), True),
        T.StructField("course_completion_date", T.StringType(), True),
        T.StructField("course_first_completion_date", T.StringType(), True),
        T.StructField("course_last_accessed_date", T.StringType(), True),
        T.StructField("last_activity_date", T.DateType(), True),
        T.StructField("is_assigned", T.BooleanType(), True),
        T.StructField("assigned_by", T.StringType(), True),
        T.StructField("user_is_deactivated", T.BooleanType(), True),
        T.StructField("lms_user_id", T.StringType(), True),
    ]
)

_TS_COLS = [
    "course_enroll_date",
    "course_start_date",
    "course_completion_date",
    "course_first_completion_date",
    "course_last_accessed_date",
]


def typed_facts(raw: DataFrame) -> DataFrame:
    """Cast the five ISO-8601 'Z' string timestamps (A12): Spark parses the
    'Z' offset natively under spark.sql.session.timeZone=UTC; NULL strings
    pass through as NULL (scripts/user_course_activity.py:183-185)."""
    out = raw
    for c in _TS_COLS:
        out = out.withColumn(c, F.to_timestamp(F.col(c)))
    return out


def merge_activity(existing: DataFrame, batch: DataFrame) -> DataFrame:
    """ON CONFLICT (user_id, course_id) DO UPDATE, set-oriented (A11)."""
    return upsert_latest_wins(
        existing,
        batch,
        keys=["user_id", "course_id"],
        order_by=["course_last_accessed_date"],
    )
