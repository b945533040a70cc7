"""The reference's course-normalization pipeline under the driver gate.

pipelines/course_catalog.normalize() is golden-tested in
tests/test_course_pipeline.py; this query additionally runs it against a
deterministic in-code fixture and value-checks the child tables against a
literal VALUES oracle — struct access, array/map explosion, the
requirements null guard, duplicate-document dedup, and the dim/bridge
join all under the hash diff (scripts/course_catalog.py:90-167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ub_etl_spark.pipelines.course_catalog import COURSE_SCHEMA, normalize
from ub_etl_spark.registry import register

_BASE = {
    "description": "d",
    "url": "/c",
    "estimated_content_length": 1,
    "num_lectures": 1,
    "num_videos": 1,
    "mobile_native_deeplink": None,
    "is_practice_test_course": False,
    "num_quizzes": 0,
    "num_practice_tests": 0,
    "has_closed_caption": False,
    "last_update_date": "2024-05-01",
    "xapi_activity_id": "x",
    "is_custom": False,
    "is_imported": False,
    "headline": "h",
    "level": "Beginner",
    "locale": {"locale": "en_US"},
    "primary_subcategory": {"title": "Engineering", "url": "/sub/eng"},
    "promo_video_url": [],
    "what_you_will_learn": {"list": []},
    "caption_languages": [],
    "caption_locales": [],
}

_C101 = {
    **_BASE,
    "id": 101,
    "title": "Spark Fundamentals",
    "primary_category": {"title": "Data", "url": "/cat/data"},
    "topics": [
        {"id": 7, "title": "Spark", "url": "/t/7"},
        {"id": 8, "title": "SQL", "url": "/t/8"},
    ],
    "instructors": ["Ada", "Grace"],
    "requirements": {"list": ["laptop", "python"]},
    "images": {"480x270": "/i/480.jpg", "100x100": "/i/100.jpg"},
}

_C102 = {
    **_BASE,
    "id": 102,
    "title": "DuckDB Deep Dive",
    "primary_category": {"title": "Data", "url": "/cat/data"},
    "topics": [{"id": 9, "title": "Ducks", "url": "/t/9"}],
    "instructors": ["Ada"],
    "requirements": None,  # the :138 null guard — no requirements rows
    "images": {},
}

# exact duplicate of 101: re-ingesting an overlapping page must be a
# fixpoint (README.md:156-163 refresh contract)
_FIXTURE = [_C101, _C102, dict(_C101)]


@register(
    "pipeline_course_normalize",
    tier="A",
    oracle="""
    SELECT * FROM (VALUES
      ('topics',             101, 'Spark'),
      ('topics',             101, 'SQL'),
      ('topics',             102, 'Ducks'),
      ('instructors',        101, 'Ada'),
      ('instructors',        101, 'Grace'),
      ('instructors',        102, 'Ada'),
      ('requirements',       101, 'laptop'),
      ('requirements',       101, 'python'),
      ('images',             101, '480x270=/i/480.jpg'),
      ('images',             101, '100x100=/i/100.jpg'),
      ('course_categories',  101, 'Data'),
      ('course_categories',  102, 'Data')
    ) AS t(tbl, course_id, item)
    """,
)
def pipeline_course_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    courses = spark.createDataFrame(_FIXTURE, COURSE_SCHEMA)
    tables = normalize(courses)

    def shaped(name: str, item: F.Column) -> DataFrame:
        return tables[name].select(
            F.lit(name).alias("tbl"),
            F.col("course_id").cast("int").alias("course_id"),
            item.alias("item"),
        )

    # bridge rows joined back to the dim so the check is on natural keys,
    # not surrogate ids
    cat_bridge = (
        tables["course_categories"]
        .join(
            tables["categories"].select(F.col("id").alias("category_id"), "title"),
            "category_id",
        )
        .select(
            F.lit("course_categories").alias("tbl"),
            F.col("course_id").cast("int").alias("course_id"),
            F.col("title").alias("item"),
        )
    )
    return (
        shaped("topics", F.col("title"))
        .unionByName(shaped("instructors", F.col("instructor_name")))
        .unionByName(shaped("requirements", F.col("requirement")))
        .unionByName(
            shaped("images", F.concat_ws("=", F.col("size"), F.col("url")))
        )
        .unionByName(cat_bridge)
    )
