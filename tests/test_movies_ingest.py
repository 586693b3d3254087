"""Ingest-path tests (SURVEY.md §1.2 dirty-data semantics, §2.1 S1-S5)."""

from __future__ import annotations

import pytest

from imdbmapreduce_spark.sources.movies_csv import read_movies_csv

CSV = "\n".join(
    [
        "movie_id,title,actors_csv",
        '1,Plain Movie,"Ann, Bob"',
        '2,"Title, With Comma","Cat, Dan"',
        # NBSP, tab, and plain spaces around tokens
        '3,Whitespace Movie,"\u00a0Ann  ,\tBob , Cat "',
        # "" escapes inside the quoted field -> literal quotes, stripped per actor
        '4,Quoted Actors," ""Ann"", Bob"',
        '5,Dup Title,"Old Cast"',
        '6,Dup Title,"New Cast"',
        "",
        '7,Empty Cast,""',
        "bad row without enough fields",
        '8,Last Movie,"Eve"',
        "",
    ]
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("movies") / "movies.csv"
    p.write_text(CSV, encoding="utf-8")
    return str(p)


def test_quote_aware_parse(spark, csv_path):
    movies = read_movies_csv(spark, csv_path, dedup=None)
    by_id = {r["movie_id"]: r for r in movies.collect()}
    # comma inside quoted title survives (the reference's naive parser
    # corrupts this — deliberate divergence, SURVEY §1.2)
    assert by_id[2]["title"] == "Title, With Comma"
    assert by_id[2]["actors"] == ["Cat", "Dan"]


def test_unicode_trim_and_quote_strip(spark, csv_path):
    movies = read_movies_csv(spark, csv_path, dedup=None)
    by_id = {r["movie_id"]: r for r in movies.collect()}
    # NBSP / tab / em-space trimmed (mapReduce.erl:146-148 semantics)
    assert by_id[3]["actors"] == ["Ann", "Bob", "Cat"]
    # "" escape resolved by reader, stray quotes stripped per actor
    assert by_id[4]["actors"] == ["Ann", "Bob"]


def test_malformed_and_empty_rows_dropped(spark, csv_path):
    movies = read_movies_csv(spark, csv_path, dedup=None)
    ids = {r["movie_id"] for r in movies.collect()}
    assert ids == {1, 2, 3, 4, 5, 6, 7, 8}  # bad row + blank line dropped


def test_empty_cast_is_empty_array(spark, csv_path):
    movies = read_movies_csv(spark, csv_path, dedup=None)
    by_id = {r["movie_id"]: r for r in movies.collect()}
    assert by_id[7]["actors"] == []


def test_dedup_last_write_wins(spark, csv_path):
    """ETS `set` last-write-wins (S3/S4) as an explicit policy."""
    movies = read_movies_csv(spark, csv_path, dedup="last")
    rows = {r["title"]: r for r in movies.collect()}
    assert rows["Dup Title"]["movie_id"] == 6
    assert rows["Dup Title"]["actors"] == ["New Cast"]
    first = read_movies_csv(spark, csv_path, dedup="first")
    rows = {r["title"]: r for r in first.collect()}
    assert rows["Dup Title"]["movie_id"] == 5


def test_row_cap(spark, csv_path):
    """R17: first-N cap (the reference's 85k) with a deterministic order."""
    movies = read_movies_csv(spark, csv_path, limit=3, dedup=None)
    assert {r["movie_id"] for r in movies.collect()} == {1, 2, 3}
