"""Tokenizer + Porter stemmer goldens (FIXTURES.md §5; SURVEY.md §2.8)."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.text.porter import porter_stem
from searchengine_spark.text.tokenizer import tokenize_query, tokens_column

PORTER_VECTORS = {
    "caresses": "caress", "flies": "fli", "mules": "mule", "agreed": "agre",
    "owned": "own", "meeting": "meet", "stating": "state", "plotted": "plot",
    "itemization": "item", "sensational": "sensat", "reference": "refer",
    "colonizer": "colon", "courts": "court", "running": "run",
    "quickly": "quickli", "property": "properti", "applies": "appli",
    "rights": "right", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "adjustable": "adjust", "defensible": "defens",
    "replacement": "replac", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "roll": "roll",
    # vectors from the published step examples in Porter (1980)
    "ponies": "poni", "cats": "cat", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "radically": "radic", "differently": "differ",
    "analogously": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formality": "formal",
    "sensitivity": "sensit", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electricity": "electr",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "irritant": "irrit",
    "adjustment": "adjust", "dependent": "depend", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controlling": "control",
}


def test_porter_vectors():
    for word, expect in PORTER_VECTORS.items():
        assert porter_stem(word) == expect, word


def test_query_tokenize_goldens():
    assert tokenize_query("The courts were running quickly", stem=True) == [
        "court", "run", "quickli",
    ]
    # isalpha parity: punctuation/number fragments dropped (FIXTURES §5)
    assert tokenize_query("Section 42 applies; see U.S. v. Smith", stem=True) == [
        "section", "appli", "see", "smith",
    ]
    assert tokenize_query("Murder") == ["murder"]
    assert tokenize_query("the of and") == []


def test_spark_tokens_match_driver_tokens(spark):
    texts = [
        "The courts were running quickly",
        "Section 42 applies; see U.S. v. Smith",
        "MURDER!!! trial... court?",
        "",
        "the of and to",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for stem in (False, True):
        got = [
            r.toks
            for r in df.select(tokens_column("text", stem=stem).alias("toks")).collect()
        ]
        expected = [tokenize_query(t, stem=stem) for t in texts]
        assert got == expected, f"stem={stem}"


def test_stopword_filter_before_stemming():
    # "running" must survive the stopword test unstemmed, then stem.
    # A buggy stem-first pipeline would test "run" against stopwords.
    assert tokenize_query("running", stem=True) == ["run"]


def test_sql_stem_case_expr_maps_and_fails_loudly():
    """The stem-dictionary oracle helper: known words map through the
    golden-tested porter_stem; any out-of-dictionary word (testdata
    vocabulary drift) must raise via DuckDB error(), never pass."""
    import duckdb
    import pytest

    from searchengine_spark.text.porter import porter_stem, sql_stem_case_expr

    expr = sql_stem_case_expr(("merges", "sorting", "key"), var="w")
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {expr} FROM (VALUES ('merges'), ('sorting'), ('key')) t(w)"
    ).fetchall()
    assert [r[0] for r in got] == [
        porter_stem("merges"), porter_stem("sorting"), porter_stem("key")
    ]
    with pytest.raises(Exception, match="no stem dictionary entry"):
        con.execute(f"SELECT {expr} FROM (VALUES ('unseen')) t(w)").fetchall()
    # nltk mode diverges from the 1980 paper on e.g. 'key' -> 'key'
    nltk_expr = sql_stem_case_expr(("key",), var="w", mode="nltk")
    assert con.execute(
        f"SELECT {nltk_expr} FROM (VALUES ('key')) t(w)"
    ).fetchone()[0] == porter_stem("key", mode="nltk")
