"""Porter stemmer + English chain + ASCII folding unit tests.

Vectors are the worked examples published in the algorithm definition
(Porter 1980, "An algorithm for suffix stripping", §2) plus the
departures the reference adopted (bli->ble, logi->log) and the filter
fine print (possessive variants, length<=2 passthrough).
"""

from lucene_spark.functions.stem import (
    ascii_fold,
    english_filter,
    porter_stem,
    strip_possessive,
)

# (word, stem) pairs from the algorithm's published step examples
PAPER_VECTORS = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valenci", "valenc"),
    ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"),
    ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"),
    ("homologou", "homolog"), ("communism", "commun"),
    ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]

# departures adopted by the reference implementation
DEPARTURES = [
    ("logic", "logic"), ("logical", "logic"), ("analogi", "analog"),
    # m(stem) == 0 blocks logi->log here ("geo" has no vc transition)
    ("geologi", "geologi"),
    ("possibli", "possibl"),  # bli -> ble then step-5 e removal path
]


def test_paper_vectors():
    bad = [
        (w, porter_stem(w), s) for w, s in PAPER_VECTORS
        if porter_stem(w) != s
    ]
    assert not bad, bad


def test_departures():
    bad = [
        (w, porter_stem(w), s) for w, s in DEPARTURES
        if porter_stem(w) != s
    ]
    assert not bad, bad


def test_short_words_pass_through():
    for w in ["a", "is", "be", "as", "s", ""]:
        assert porter_stem(w) == w


def test_idempotent_on_corpus_vocab():
    # documents-corpus words: mostly already stems; spot-pin the mapping
    assert porter_stem("merge") == "merg"
    assert porter_stem("batches") == "batch"
    assert porter_stem("window") == "window"
    assert porter_stem("scan") == "scan"


def test_possessive():
    assert strip_possessive("dog's") == "dog"
    assert strip_possessive("dog’s") == "dog"
    assert strip_possessive("dogs") == "dogs"
    assert strip_possessive("'s") == ""
    assert strip_possessive("s") == "s"


def test_english_filter_chain():
    assert english_filter("dog's") == "dog"
    assert english_filter("running's") == "run"


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("ærøskøbing") == "aeroskobing"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("plain ascii") == "plain ascii"
    # unfoldable characters pass through
    assert ascii_fold("文字") == "文字"


def test_english_index_end_to_end(spark, tmp_path):
    """Index through the English chain: surface variants stem to one term,
    and mapped queries hit all of them (the EnglishAnalyzer contract)."""
    from lucene_spark.functions.stem import english_filter
    from lucene_spark.operators.indexer import build_index
    from lucene_spark.operators.search import Searcher
    from lucene_spark.plans.query import map_terms

    rows = [
        (0, "merging tables fast"),
        (1, "merged table yesterday"),
        (2, "merges the tables"),
        (3, "nothing relevant here"),
        (4, "dog's merge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "en_idx")
    build_index(
        spark, docs, idx, key_col="doc_id", text_col="text",
        gid_col="doc_id", n_segments=2, token_filter=english_filter,
    )
    s = Searcher(spark, idx)
    hits = s.search(map_terms("merging", english_filter), k=10,
                    with_keys=False)
    assert set(hits["gid"]) == {0, 1, 2, 4}
    # possessive chain: "dog's" indexed as "dog"
    hits2 = s.search(map_terms("dog", english_filter), k=10, with_keys=False)
    assert set(hits2["gid"]) == {4}
    # phrase across stemmed forms: "merged table" matches "merging tables";
    # doc 2 is excluded by the stop hole ("merges THE tables" — position
    # holes survive the stem chain exactly as in the reference)
    hits3 = s.search(map_terms('"merging tables"', english_filter), k=10,
                     with_keys=False)
    assert set(hits3["gid"]) == {0, 1}
