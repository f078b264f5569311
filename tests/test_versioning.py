"""Snapshot diff: all four statuses from a constructed pair, and the
re-process set property (added+changed is exactly what differs)."""

from careers_spark.operators.versioning import snapshot_diff


def test_snapshot_diff_golden(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], schema="doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], schema="doc_id long, text string"
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(old, new, key="doc_id", content="text").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_fingerprints_null_on_absent_side(spark):
    old = spark.createDataFrame([(1, "x")], schema="doc_id long, text string")
    new = spark.createDataFrame([(2, "y")], schema="doc_id long, text string")
    rows = {r.doc_id: r for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert rows[1].new_fp is None and rows[1].old_fp is not None
    assert rows[2].old_fp is None and rows[2].new_fp is not None


def test_snapshot_diff_identical_versions_all_unchanged(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], schema="doc_id long, text string"
    )
    out = snapshot_diff(docs, docs, "doc_id", "text")
    assert out.filter("status != 'unchanged'").count() == 0
    assert out.count() == 50
