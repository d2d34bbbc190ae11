"""SimpleQueryParser structural tests.

Mirrors the reference's TestSimpleQueryParser
(lucene/queryparser/src/test/.../simple/TestSimpleQueryParser.java) —
same inputs, expected trees re-expressed in this engine's query nodes.
The reference helper sets defaultOperator=MUST, so most cases here do
too; our StandardAnalyzer replaces the tests' MockAnalyzer (whitespace+
lowercase), which only matters where MockTokenizer.KEYWORD kept
operator characters inside terms — those asserts are adapted to what
the standard chain produces.
"""

import random

import pytest

from lucene_spark.plans.query import (
    BoolQ, BoostQ, FuzzyQ, MatchAllQ, PhraseQ, PrefixQ, SloppyQ, TermQ,
)
from lucene_spark.plans.simple_parser import (
    AND_OPERATOR, ESCAPE_OPERATOR, FUZZY_OPERATOR, NEAR_OPERATOR,
    NOT_OPERATOR, OR_OPERATOR, PHRASE_OPERATOR, PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR, SimpleQueryParser, WHITESPACE_OPERATOR, parse_simple,
)


def parse(text, flags=-1):
    # the reference test helper: single field, default operator MUST
    return SimpleQueryParser(flags=flags, default_operator="must").parse(text)


def T(w):
    return TermQ(w)


def MUST(*cs):
    return BoolQ(must=tuple(cs))


def SHOULD(*cs):
    return BoolQ(should=tuple(cs))


def NOT(c):
    return BoolQ(should=(MatchAllQ(),), must_not=(c,))


def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    assert parse("foobar~2") == FuzzyQ("foobar", max_edits=2)
    assert parse("foobar~") == FuzzyQ("foobar", max_edits=2)
    # non-numeric suffix -> fuzziness 0 -> plain term ("foobar~a"
    # analyzed: the tilde splits word runs, so assert via numeric forms)
    assert parse("foobar~0") == T("foobar")
    assert parse("foobar~-5") == T("foobar")
    # over the max -> capped at 2 (LevenshteinAutomata max)
    assert parse("foo~3 bar") == MUST(FuzzyQ("foo", max_edits=2), T("bar"))


def test_phrase():
    assert parse('"foo bar"') == PhraseQ(("foo", "bar"), (0, 1))


def test_phrase_with_slop():
    assert parse('"foo bar"~2') == SloppyQ(("foo", "bar"), (0, 1), slop=2)
    assert parse('"foo bar"~10') == SloppyQ(("foo", "bar"), (0, 1), slop=10)
    # trailing tilde with no/absurd slop -> slop 0 (exact phrase)
    assert parse('"foo bar"~') == PhraseQ(("foo", "bar"), (0, 1))
    assert parse('"foo bar"~-1') == PhraseQ(("foo", "bar"), (0, 1))
    assert parse('"foo bar"~12 baz') == MUST(
        SloppyQ(("foo", "bar"), (0, 1), slop=12), T("baz"))


def test_prefix():
    assert parse("foobar*") == PrefixQ("foobar")


def test_and():
    assert parse("foo+bar") == MUST(T("foo"), T("bar"))
    assert parse("foo bar") == MUST(T("foo"), T("bar"))


def test_and_phrase():
    p1 = PhraseQ(("foo", "bar"), (0, 1))
    p2 = PhraseQ(("star", "wars"), (0, 1))
    assert parse('"foo bar"+"star wars"') == MUST(p1, p2)


def test_or():
    assert parse("foo|bar") == SHOULD(T("foo"), T("bar"))
    assert parse("foo||bar") == SHOULD(T("foo"), T("bar"))


def test_or_implicit_default():
    # fresh parser, reference-default operator (SHOULD)
    assert parse_simple("foo bar") == SHOULD(T("foo"), T("bar"))


def test_or_phrase():
    p1 = PhraseQ(("foo", "bar"), (0, 1))
    p2 = PhraseQ(("star", "wars"), (0, 1))
    assert parse('"foo bar"|"star wars"') == SHOULD(p1, p2)


def test_not():
    assert parse("-foo") == NOT(T("foo"))
    assert parse("-(foo)") == NOT(T("foo"))
    assert parse("---foo") == NOT(T("foo"))
    # double negation cancels
    assert parse("--foo") == T("foo")
    # whitespace between '-' and token drops the negation
    assert parse("- foo") == T("foo")


def test_crazy_prefixes():
    # mid-term '*' stays in the prefix text; only the trailing one strips
    assert parse("st*ar*") == PrefixQ("st*ar")
    # escaped trailing '*' is not a prefix operator
    assert parse("st*ar\\*") != PrefixQ("st*ar")


def test_garbage_term():
    expected = T("star")
    for text in ("star", "star\n", "star\r", "star\t", "star(", "star)",
                 'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(text) == expected, text


def test_garbage_empty():
    for text in ("", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
                 '(" "|" ")', '" " " "', '(" " " ")'):
        assert parse(text) is None, repr(text)


def test_garbage_and():
    expected = MUST(T("star"), T("wars"))
    for text in ("star wars", "star+wars", "     star     wars   ",
                 "     star +    wars   ", "  |     star + + |   wars   ",
                 "  |     star + + |   wars   \\"):
        assert parse(text) == expected, text


def test_garbage_or():
    expected = SHOULD(T("star"), T("wars"))
    for text in ("star|wars", "     star |    wars   ",
                 "  |     star | + |   wars   ",
                 "  +     star | + +   wars   \\"):
        assert parse(text) == expected, text


def test_garbage_not():
    expected = NOT(T("star"))
    for text in ("-star", "---star", "- -star -"):
        assert parse(text) == expected, text


def test_garbage_phrase():
    expected = PhraseQ(("star", "wars"), (0, 1))
    for text in ('"star wars"', '"star wars\\ "', '"" | "star wars"',
                 '          "star wars"        ""\\'):
        assert parse(text) == expected, text


def test_garbage_subquery():
    expected = T("star")
    for text in ("(star)", "(star))", "((star)",
                 "     -()(star)        \n\n\r     ",
                 "| + - ( + - |      star    \n      ) \n"):
        assert parse(text) == expected, text


def test_compound_and():
    expected = MUST(T("star"), T("wars"), T("empire"))
    for text in ("star wars empire", "star+wars + empire",
                 " | --star wars empire \n\\"):
        assert parse(text) == expected, text


def test_compound_or():
    expected = SHOULD(T("star"), T("wars"), T("empire"))
    for text in ("star|wars|empire", "star|wars | empire",
                 " | --star|wars|empire \n\\"):
        assert parse(text) == expected, text


def test_complex00():
    expected = MUST(SHOULD(T("star"), T("wars")), T("empire"))
    for text in ("star|wars empire", "star|wars + empire",
                 "star| + wars + ----empire |"):
        assert parse(text) == expected, text


def test_complex01():
    expected = SHOULD(MUST(T("star"), T("wars")), T("empire"))
    for text in ("star wars | empire", "star + wars|empire",
                 "star + | wars | ----empire +"):
        assert parse(text) == expected, text


def test_complex02():
    expected = SHOULD(MUST(T("star"), T("wars")), T("empire"), T("strikes"))
    for text in ("star wars | empire | strikes",
                 "star + wars|empire | strikes",
                 "star + | wars | ----empire | + --strikes \\"):
        assert parse(text) == expected, text


def test_complex03():
    inner = SHOULD(MUST(T("star"), T("wars")), T("empire"), T("strikes"))
    expected = MUST(inner, T("back"))
    for text in ("star wars | empire | strikes back",
                 "star + wars|empire | strikes + back",
                 "star + | wars | ----empire | + --strikes + | --back \\"):
        assert parse(text) == expected, text


def test_complex04():
    expected = SHOULD(MUST(T("star"), T("wars")), T("empire"),
                      MUST(T("strikes"), T("back")))
    for text in ("(star wars) | empire | (strikes back)",
                 "(star + wars) |empire | (strikes + back)",
                 "(star + | wars |) | ----empire | + --(strikes + | --back) \\"):
        assert parse(text) == expected, text


def test_complex05():
    inner3 = MUST(T("strikes"), T("back"), NOT(T("jarjar")))
    expected = SHOULD(MUST(T("star"), T("wars")), SHOULD(T("empire"), inner3))
    for text in ("(star wars) | (empire | (strikes back -jarjar))",
                 "(star + wars) |(empire | (strikes + back -jarjar) () )",
                 '(star + | wars |) | --(--empire | + --(strikes + | '
                 '--back + -jarjar) "" ) "'):
        assert parse(text) == expected, text


def test_complex06():
    # jar\+\|jar: escapes glue operator chars into the token; our
    # analyzer then splits the punctuation into (jar, jar) positions 0,1
    # -> a must-boolean of the analyzed tokens (createBooleanQuery)
    jar = MUST(T("jar"), T("jar"))
    inner2 = MUST(SHOULD(T("empire"), T("strikes")), T("back"), jar)
    expected = MUST(T("star"), SHOULD(T("wars"), inner2))
    for text in ("star (wars | (empire | strikes back jar\\+\\|jar))",
                 "star + (wars |(empire | strikes + back jar\\+\\|jar) () )",
                 "star + (| wars | | --(--empire | + --strikes + | --back "
                 '+ jar\\+\\|jar) "" ) "'):
        assert parse(text) == expected, text


def test_weighted_term():
    from lucene_spark.plans.fields import qualify

    p = SimpleQueryParser(weights={"field0": 5.0, "field1": 10.0})
    assert p.parse("foo") == SHOULD(
        BoostQ(TermQ(qualify("field0", "foo")), boost=5.0),
        BoostQ(TermQ(qualify("field1", "foo")), boost=10.0),
    )


def test_weighted_or():
    from lucene_spark.plans.fields import qualify

    p = SimpleQueryParser(weights={"field0": 5.0, "field1": 10.0})
    foo = SHOULD(BoostQ(TermQ(qualify("field0", "foo")), boost=5.0),
                 BoostQ(TermQ(qualify("field1", "foo")), boost=10.0))
    bar = SHOULD(BoostQ(TermQ(qualify("field0", "bar")), boost=5.0),
                 BoostQ(TermQ(qualify("field1", "bar")), boost=10.0))
    assert p.parse("foo|bar") == SHOULD(foo, bar)


def test_disable_phrase():
    # with the phrase operator off the quotes are ordinary characters;
    # our analyzer strips them -> a must-boolean of the inner tokens
    assert parse('"foo bar"', ~PHRASE_OPERATOR) == MUST(T("foo"), T("bar"))


def test_disable_prefix():
    # trailing '*' is text; the analyzer drops punctuation -> plain term
    assert parse("test*", ~PREFIX_OPERATOR) == T("test")


def test_disable_and():
    assert parse("foo+bar", ~AND_OPERATOR) == MUST(T("foo"), T("bar"))
    # with AND on, leading '+' is ignored; off, it is token text
    assert parse("+foo+bar", ~AND_OPERATOR) == MUST(T("foo"), T("bar"))


def test_disable_or():
    assert parse("foo|bar", ~OR_OPERATOR) == MUST(T("foo"), T("bar"))


def test_disable_not():
    # '-' is token text -> "-foo" analyzes to the term foo, unnegated
    assert parse("-foo", ~NOT_OPERATOR) == T("foo")


def test_disable_precedence():
    assert parse("(foo)", ~PRECEDENCE_OPERATORS) == T("foo")
    assert parse(")foo(", ~PRECEDENCE_OPERATORS) == T("foo")


def test_disable_whitespace():
    # whitespace is token text: the whole string is ONE token, then the
    # analyzer splits it -> a must-boolean of both occurrences
    assert parse("foo foo", ~WHITESPACE_OPERATOR) == MUST(T("foo"), T("foo"))


def test_disable_fuzziness():
    # '~1' is token text; the analyzer splits foo and 1
    assert parse("foo~1", ~FUZZY_OPERATOR) == MUST(T("foo"), T("1"))


def test_disable_slop():
    # phrase parses, but '~2' becomes a separate token (term "2")
    assert parse('"foo bar"~2', ~NEAR_OPERATOR) == MUST(
        PhraseQ(("foo", "bar"), (0, 1)), T("2"))


def test_star_becomes_match_all():
    assert parse("*") == MatchAllQ()
    assert parse(" *   ") == MatchAllQ()


def test_null_branch_keeps_pending_operator():
    # "the" is a stopword -> newDefaultQuery returns null -> the pending
    # '|' must survive to attach "wars" (the reset sits inside the
    # branch != null block, SimpleQueryParser.java:440-479)
    assert parse("star | the wars") == SHOULD(T("star"), T("wars"))


def test_default_operator_validation():
    with pytest.raises(ValueError):
        SimpleQueryParser(default_operator="filter")


def test_never_raises_on_random_garbage():
    rng = random.Random(42)
    chars = ['a', '1', '|', '&', ' ', '(', ')', '"', '-', '~', '+', '*',
             '\\', '\t']
    for _ in range(2000):
        s = "".join(rng.choice(chars) for _ in range(rng.randrange(20)))
        parse(s)  # no exception
        parse(s, flags=rng.randrange(1024))  # no exception
        parse_simple(s)  # no exception


def test_searchable_output(spark_session=None):
    # parse output executes end-to-end (smoke; gated at sf0.01 by the
    # simple_parse entries in __spark_entry__)
    node = parse("star + wars | -empire")
    assert node == SHOULD(MUST(T("star"), T("wars")), NOT(T("empire")))
