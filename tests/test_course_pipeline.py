"""Golden end-to-end normalization test (SURVEY.md §5.3): nested course
JSON -> 13 tables, idempotence on re-run, null-guard behavior."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from ub_etl_spark.pipelines.course_catalog import (
    COURSE_SCHEMA,
    PAGE_SCHEMA,
    courses_from_pages,
    normalize,
)
from ub_etl_spark.pipelines.user_activity import RAW_SCHEMA, merge_activity, typed_facts

COURSE_1 = {
    "id": 101,
    "title": "Spark Fundamentals",
    "description": "desc",
    "url": "/c/101",
    "estimated_content_length": 120,
    "num_lectures": 10,
    "num_videos": 9,
    "mobile_native_deeplink": None,  # .get()-tolerated (:102)
    "is_practice_test_course": False,
    "num_quizzes": 2,
    "num_practice_tests": 0,
    "has_closed_caption": True,
    "last_update_date": "2024-05-01",
    "xapi_activity_id": "xapi-101",
    "is_custom": False,
    "is_imported": False,
    "headline": "h",
    "level": "Beginner",
    "locale": {"locale": "en_US"},
    "primary_category": {"title": "Data", "url": "/cat/data"},
    "primary_subcategory": {"title": "Engineering", "url": "/sub/eng"},
    "topics": [
        {"id": 7, "title": "Spark", "url": "/t/7"},
        {"id": 8, "title": "SQL", "url": "/t/8"},
    ],
    "promo_video_url": [{"type": "video/mp4", "label": "720p", "file": "f.mp4"}],
    "instructors": ["Ada", "Grace"],
    "requirements": {"list": ["laptop", "python"]},
    "what_you_will_learn": {"list": ["joins", "windows"]},
    "images": {"480x270": "/i/480.jpg", "100x100": "/i/100.jpg"},
    "caption_languages": ["English", "Spanish"],
    "caption_locales": [
        {"locale": "en_US", "title": "English", "english_title": "English"}
    ],
}

COURSE_2 = {
    **COURSE_1,
    "id": 102,
    "title": "DuckDB Deep Dive",
    "requirements": None,  # absent guard (:138)
    "primary_category": {"title": "Data", "url": "/cat/data"},  # same dim row
    "primary_subcategory": {"title": "Analytics", "url": "/sub/ana"},
    "topics": [{"id": 7, "title": "Spark", "url": "/t/7"}],
    "instructors": ["Ada"],
    "images": {},
    "caption_languages": [],
    "caption_locales": [],
    "promo_video_url": [],
    "what_you_will_learn": {"list": []},
}


@pytest.fixture(scope="module")
def tables(spark):
    pages = [
        {"next": "page2", "results": [COURSE_1]},
        {"next": None, "results": [COURSE_2]},
    ]
    df = spark.createDataFrame([(json.dumps(p),) for p in pages], "raw string").select(
        F.from_json("raw", PAGE_SCHEMA).alias("p")
    ).select("p.*")
    courses = courses_from_pages(df)
    # from_json marks everything nullable; compare names/types only
    assert [(f.name, f.dataType) for f in courses.schema.fields] == [
        (f.name, f.dataType) for f in COURSE_SCHEMA.fields
    ]
    return normalize(courses)


def test_all_13_tables(tables):
    assert len(tables) == 13


def test_courses_hub(tables):
    rows = {r.id: r for r in tables["courses"].collect()}
    assert set(rows) == {101, 102}
    assert rows[101].locale == "en_US"
    assert rows[101].mobile_native_deeplink is None
    assert str(rows[101].last_update_date) == "2024-05-01"


def test_category_dim_dedup_and_bridge(tables):
    cats = tables["categories"].collect()
    assert len(cats) == 1 and cats[0].title == "Data"
    bridge = {(r.course_id, r.category_id) for r in tables["course_categories"].collect()}
    assert bridge == {(101, cats[0].id), (102, cats[0].id)}
    subs = {r.title for r in tables["subcategories"].collect()}
    assert subs == {"Engineering", "Analytics"}


def test_children_exploded(tables):
    topics = {(r.course_id, r.topic_id) for r in tables["topics"].collect()}
    assert topics == {(101, 7), (101, 8), (102, 7)}
    reqs = {(r.course_id, r.requirement) for r in tables["requirements"].collect()}
    assert reqs == {(101, "laptop"), (101, "python")}  # course 102 guarded out
    imgs = {(r.course_id, r.size, r.url) for r in tables["images"].collect()}
    assert imgs == {(101, "480x270", "/i/480.jpg"), (101, "100x100", "/i/100.jpg")}
    instr = {(r.course_id, r.instructor_name) for r in tables["instructors"].collect()}
    assert instr == {(101, "Ada"), (101, "Grace"), (102, "Ada")}


def test_normalize_idempotent(spark, tables):
    """Re-running over duplicated input pages is a fixpoint (§1.4 fix)."""
    doubled = spark.createDataFrame(
        [(json.dumps(COURSE_1),), (json.dumps(COURSE_1),), (json.dumps(COURSE_2),)],
        "raw string",
    ).select(F.from_json("raw", COURSE_SCHEMA).alias("c")).select("c.*")
    t2 = normalize(doubled)
    for name in ("courses", "topics", "instructors", "images", "categories"):
        assert t2[name].count() == tables[name].count(), name


def test_user_activity_typed_and_merged(spark):
    gen1 = spark.createDataFrame(
        [
            {
                "user_id": 1,
                "course_id": 101,
                "completion_ratio": 0.2,
                "course_enroll_date": "2024-01-01T10:00:00Z",
                "course_last_accessed_date": "2024-01-02T00:00:00Z",
            }
        ],
        RAW_SCHEMA,
    )
    gen2 = spark.createDataFrame(
        [
            {
                "user_id": 1,
                "course_id": 101,
                "completion_ratio": 0.8,
                "course_enroll_date": None,  # null-through (A12)
                "course_last_accessed_date": "2024-02-01T00:00:00Z",
            }
        ],
        RAW_SCHEMA,
    )
    t1, t2 = typed_facts(gen1), typed_facts(gen2)
    assert str(t1.first().course_enroll_date) == "2024-01-01 10:00:00"
    assert t2.first().course_enroll_date is None
    merged = merge_activity(t1, t2)
    row = merged.collect()
    assert len(row) == 1 and row[0].completion_ratio == 0.8
