"""Line-level boilerplate removal (text/boilerplate.py)."""

from __future__ import annotations

import hashlib

from searchengine_spark.text import boilerplate as bp


def test_planted_lines_flagged_and_originals_kept(spark, sf_dir):
    from searchengine_spark.io import load_table

    docs = bp.with_boilerplate_lines(load_table(spark, sf_dir, "documents"))
    flagged = {r["line"] for r in bp.boilerplate_lines(docs).collect()}
    assert flagged == {line for _, line in bp.BOILER_LINES}


def test_scrub_preserves_order_and_md5(spark):
    rows = [
        (1, "first original line\nBOILER\nsecond original line"),
        (2, "other text\nBOILER"),
        (3, "BOILER\nlone survivor"),
    ] + [(10 + i, f"unique {i}\nBOILER") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bp.scrub_boilerplate(docs).collect()}
    # BOILER appears in every doc (share 100% > 2%); originals unique
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    want = hashlib.md5(
        b"first original line\nsecond original line"
    ).hexdigest()
    assert out[1]["scrubbed_md5"] == want  # order preserved
    assert out[3]["n_kept"] == 1
    assert (
        out[3]["scrubbed_md5"]
        == hashlib.md5(b"lone survivor").hexdigest()
    )


def test_all_lines_removed_doc_hashes_empty(spark):
    rows = [(i, "BOILER") for i in range(60)] + [
        (100 + i, f"real doc {i}\nBOILER") for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bp.scrub_boilerplate(docs).collect()}
    assert out[0]["n_kept"] == 0
    assert out[0]["scrubbed_md5"] == hashlib.md5(b"").hexdigest()
    assert out[100]["n_kept"] == 1
