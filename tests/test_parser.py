"""Query-parser parity with LuceneBackedQueryParser semantics
(reference miru-plugin/.../query/LuceneBackedQueryParser.java:76-136):
default-AND, OR, NOT→pButNotQ, field:term, trailing-* prefix, parens."""

import pytest
from pyspark.sql import functions as F

from miru_spark.query.ast import And, Not, Or, Prefix, Term
from miru_spark.query.parser import QueryParseError, parse_query


def test_single_term():
    assert parse_query("alpha") == Term("alpha")


def test_default_and():
    assert parse_query("alpha beta") == And((Term("alpha"), Term("beta")))
    assert parse_query("alpha AND beta") == And((Term("alpha"), Term("beta")))


def test_or():
    assert parse_query("alpha OR beta") == Or((Term("alpha"), Term("beta")))


def test_not_requires_positive_context():
    q = parse_query("alpha AND NOT beta")
    assert q == And((Term("alpha"), Not(Term("beta"))))


def test_prefix():
    assert parse_query("err*") == Prefix("err")


def test_field():
    assert parse_query("role:assistant") == Term("assistant", "role")
    assert parse_query("role:assistant AND timeout") == And(
        (Term("assistant", "role"), Term("timeout"))
    )


def test_parens_precedence():
    q = parse_query("a AND (b OR c)")
    assert q == And((Term("a"), Or((Term("b"), Term("c")))))
    # OR binds looser than default-AND
    q2 = parse_query("a b OR c")
    assert q2 == Or((And((Term("a"), Term("b"))), Term("c")))


def test_query_text_analyzed_like_index():
    # "Time-Out" analyzes to two terms -> AND of them
    assert parse_query("Time-Out") == And((Term("time"), Term("out")))
    assert parse_query("ALPHA") == Term("alpha")


def test_unknown_field_is_text():
    # unknown prefix-with-colon is analyzed as text (colon is a separator)
    assert parse_query("foo:bar") == And((Term("foo"), Term("bar")))


def test_errors():
    with pytest.raises(QueryParseError):
        parse_query("")
    with pytest.raises(QueryParseError):
        parse_query("(a OR b")


def test_leading_dash_is_must_not():
    # Lucene MUST_NOT sugar: '-term' negates (the lexer emits '-term' as
    # one word token; it must NOT silently become a positive match)
    assert parse_query("alpha -beta") == And((Term("alpha"), Not(Term("beta"))))
    assert parse_query("-beta") == And((Not(Term("beta")),))
    # standalone dash operator still works
    assert parse_query("alpha - beta") == And((Term("alpha"), Not(Term("beta"))))
    # analyzer still applies to the negated token
    assert parse_query("alpha -Time-Out") == And(
        (Term("alpha"), Not(And((Term("time"), Term("out")))))
    )


def test_leading_plus_is_must():
    # Lucene MUST sugar: under the default-AND grammar '+clause' ==
    # clause — but it must preserve the clause's meaning ('+role:x'
    # previously degraded to a text search for 'role x')
    assert parse_query("+alpha +beta") == And((Term("alpha"), Term("beta")))
    assert parse_query("+role:assistant alpha") == And(
        (Term("assistant", "role"), Term("alpha"))
    )
    # bare '+' before a group (the lexer splits '+(' into '+', '(')
    assert parse_query("+(alpha OR beta) -gamma") == And(
        (Or((Term("alpha"), Term("beta"))), Not(Term("gamma")))
    )


def test_signed_phrases():
    from miru_spark.query.ast import Phrase

    # the quoted lexeme accepts a +/- sign so signed phrases stay intact
    assert parse_query('+"hash join" scan') == And(
        (Phrase(("hash", "join")), Term("scan"))
    )
    assert parse_query('-"hash join" scan') == And(
        (Not(Phrase(("hash", "join"))), Term("scan"))
    )


def test_range_and_authz_syntax():
    from miru_spark.query.ast import AuthzAny, Range

    assert parse_query("turn_idx:[1 TO 5]") == Range("turn_idx", "1", "5")
    assert parse_query("turn_idx:{1 TO 5}") == Range(
        "turn_idx", "1", "5", lo_inc=False, hi_inc=False
    )
    assert parse_query("turn_idx:>=3") == Range("turn_idx", lo="3")
    assert parse_query("turn_idx:<7") == Range("turn_idx", hi="7", hi_inc=False)
    assert parse_query("ts:[* TO 2024-06-01]") == Range("ts", None, "2024-06-01")
    # timestamp values span lexer tokens (contain spaces)
    assert parse_query("ts:[2024-01-01 00:30:00 TO 2024-01-02 01:00:00]") == Range(
        "ts", "2024-01-01 00:30:00", "2024-01-02 01:00:00"
    )
    assert parse_query("authz:g3,g5") == AuthzAny(("g3", "g5"))
    q = parse_query("spark AND turn_idx:[1 TO 2]")
    assert q == And((Term("spark"), Range("turn_idx", "1", "2")))
    with pytest.raises(QueryParseError):
        parse_query("turn_idx:[1 TO")
    with pytest.raises(QueryParseError):
        parse_query("authz:")


def test_text_numeric_range_end_to_end(spark):
    """text:[lo TO hi] matches docs containing a NUMERIC token in the
    range, numerically ('007' matches [5 TO 10]) — the reference's
    numeric-lex term scan (MiruTermComposer.java:35-119) over the
    postings term dictionary."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search

    rows = [
        ("c0", 0, "user", "error code 99 seen", None, "2024-01-01 00:00:00"),
        ("c0", 1, "assistant", "retry after 150 ms", None, "2024-01-01 00:00:01"),
        ("c1", 0, "user", "batch of 250 rows", None, "2024-01-01 00:00:02"),
        ("c1", 1, "assistant", "pad 007 literal", None, "2024-01-01 00:00:03"),
        ("c2", 0, "user", "no numerics here", None, "2024-01-01 00:00:04"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)

    got = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, "text:[100 TO 250]", k=10).collect()
    }
    assert got == {("c0", 1), ("c1", 0)}
    # leading-zero token compares numerically
    got2 = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, "text:[5 TO 10]", k=10).collect()
    }
    assert got2 == {("c1", 1)}
    # open-ended sugar + combination with a scored term
    got3 = {
        (r["conv_id"], r["turn_idx"])
        for r in search(idx, "retry AND text:>=100", k=10).collect()
    }
    assert got3 == {("c0", 1)}
    # row_predicate parity (streaming delivery path)
    from miru_spark.query.filters import row_predicate
    from miru_spark.query.parser import parse_query
    from miru_spark.tokenize import tokens_col

    pred = row_predicate(parse_query("text:[100 TO 250]"), tokens_col("text"))
    marked = {
        (r["conv_id"], r["turn_idx"])
        for r in turns.where(pred).select("conv_id", "turn_idx").collect()
    }
    assert marked == {("c0", 1), ("c1", 0)}


def test_wildcard_fuzzy_parse():
    """Lucene wildcard/fuzzy grammar: '?'/'mid-*' -> Wildcard, '~N' ->
    Fuzzy (bare '~' = 2 edits), trailing single '*' stays Prefix, and
    all-wildcard patterns are rejected."""
    import pytest

    from miru_spark.query.ast import Fuzzy, Prefix, Wildcard
    from miru_spark.query.parser import QueryParseError, parse_query

    assert parse_query("fo*bar") == Wildcard("fo*bar")
    assert parse_query("f?x") == Wildcard("f?x")
    assert parse_query("*bar") == Wildcard("*bar")
    assert parse_query("foo*") == Prefix("foo")  # cheap path unchanged
    assert parse_query("spark~1") == Fuzzy("spark", 1)
    assert parse_query("spark~") == Fuzzy("spark", 2)  # Lucene default
    with pytest.raises(QueryParseError):
        parse_query("**")


def test_wildcard_fuzzy_search(spark):
    """Wildcard and fuzzy leaves resolve against the term dictionary and
    score/compose like ordinary leaves on both serving paths."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search
    from miru_spark.query.filters import row_predicate
    from miru_spark.query.parser import parse_query
    from miru_spark.tokenize import tokens_col

    rows = [
        ("c0", 0, "user", "spark shuffle wins", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "spork and spoon", None, "2024-01-01 00:00:01"),
        ("c1", 0, "user", "sharding the shuffle scan", None, "2024-01-01 00:00:02"),
        ("c1", 1, "user", "shuttle to the stars", None, "2024-01-01 00:00:03"),
        ("c2", 0, "user", "slow sort here", None, "2024-01-01 00:00:04"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)

    for q, want in [
        ("sh*le", {("c0", 0), ("c1", 0), ("c1", 1)}),
        ("spark~1", {("c0", 0), ("c0", 1)}),
        ("s?an OR slow", {("c1", 0), ("c2", 0)}),
        ("sh*le AND NOT shuttle", {("c0", 0), ("c1", 0)}),
    ]:
        got = {
            (r["conv_id"], r["turn_idx"]) for r in search(idx, q, k=50).collect()
        }
        assert got == want, q
        rp = {
            (r["conv_id"], r["turn_idx"])
            for r in turns.where(
                row_predicate(parse_query(q), tokens_col("text"))
            ).collect()
        }
        assert rp == want, f"row predicate {q}"


def test_boost_parse_and_rank(spark):
    """'^B' boost: parse on terms/prefixes/wildcards/fuzzies/phrases,
    boosted scoring multiplies that leaf's idf, and a term matched by
    several leaves takes the max weight (still scores once)."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.ast import Fuzzy, Phrase, Prefix, Term, Wildcard
    from miru_spark.query.bm25 import search
    from miru_spark.query.parser import parse_query

    assert parse_query("fast^3") == Term("fast", boost=3.0)
    assert parse_query("fo*^2") == Prefix("fo", boost=2.0)
    assert parse_query("f?o^2") == Wildcard("f?o", boost=2.0)
    assert parse_query("spark~1^0.5") == Fuzzy("spark", 1, boost=0.5)
    assert parse_query('"a b"~1^2') == Phrase(("a", "b"), slop=1, boost=2.0)

    rows = [
        ("c0", 0, "user", "fast fast fast lane", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "the the the slow lane", None, "2024-01-01 00:00:01"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)

    def top(q):
        return search(idx, q, k=2).collect()[0]["turn_idx"]

    # equal idf both ways; boost decides the winner
    assert top("the OR fast^5") == 0
    assert top("the^5 OR fast") == 1
    # overlapping leaves: exact fast^4 plus prefix fa*^2 -> max weight 4,
    # scored once: equals the plain fast^4 score
    s_overlap = search(idx, "fast^4 OR fa*^2", k=1).collect()[0]["score"]
    s_plain = search(idx, "fast^4", k=1).collect()[0]["score"]
    assert abs(s_overlap - s_plain) < 1e-9


def test_field_group(spark):
    """'field:(a OR b)' retargets the group's leaves (incl. wildcard/
    fuzzy) at the metadata field; nested fields and phrases inside a
    group are rejected."""
    import pytest

    from miru_spark.index import InvertedIndex
    from miru_spark.query.ast import And, Not, Or, Prefix, Term, Wildcard
    from miru_spark.query.bm25 import search
    from miru_spark.query.parser import QueryParseError, parse_query

    assert parse_query("role:(user OR assistant)") == Or(
        (Term("user", "role"), Term("assistant", "role"))
    )
    assert parse_query("tool:(src* AND NOT s?c2)") == And(
        (Prefix("src", "tool"), Not(Wildcard("s?c2", "tool")))
    )
    with pytest.raises(QueryParseError):
        parse_query('role:("a b")')
    with pytest.raises(QueryParseError):
        parse_query("role:(tool:x)")
    with pytest.raises(QueryParseError):
        parse_query("bogusfield:(x)")

    rows = [
        ("c0", 0, "user", "alpha beta", "hammer", "2024-01-01 00:00:00"),
        ("c0", 1, "assistant", "alpha beta", "wrench", "2024-01-01 00:00:01"),
        ("c0", 2, "tool", "alpha beta", None, "2024-01-01 00:00:02"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)
    got = {
        r["turn_idx"]
        for r in search(idx, "alpha AND role:(user OR assistant)", k=10).collect()
    }
    assert got == {0, 1}
    got2 = {
        r["turn_idx"]
        for r in search(idx, "alpha AND tool:(ham*)", k=10).collect()
    }
    assert got2 == {0}


def test_more_like_this(spark):
    """MLT: source doc's top tf-idf terms drive an OR search; the
    source itself never answers, and similar docs rank first."""
    import pytest

    from miru_spark.index import InvertedIndex
    from miru_spark.query.mlt import interesting_terms, more_like_this

    rows = [
        ("c0", 0, "user", "kafka stream consumer lag", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "kafka consumer lag monitoring", None, "2024-01-01 00:00:01"),
        ("c1", 0, "user", "gardening tips for spring", None, "2024-01-01 00:00:02"),
        ("c1", 1, "user", "spring flowers and gardening", None, "2024-01-01 00:00:03"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)
    src = idx.docs.where("conv_id = 'c0' AND turn_idx = 0").collect()[0]["docint"]
    terms = interesting_terms(idx, src, top_terms=3)
    assert set(terms) <= {"kafka", "stream", "consumer", "lag"}
    out = more_like_this(idx, src, top_terms=3, k=3).collect()
    assert all(r["docint"] != src for r in out)
    assert (out[0]["conv_id"], out[0]["turn_idx"]) == ("c0", 1)
    with pytest.raises(ValueError, match="postings"):
        interesting_terms(idx, 10**9)


def test_multiterm_rewrite(spark):
    """Wildcard/fuzzy leaves rewrite to exact term sets against the
    dictionary (Lucene MultiTermQuery -> TermInSet): expanded plans push
    equality filters, results identical; over-cap leaves keep the scan
    predicate; no-match leaves become an impossible term."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.ast import Or, Term, Wildcard
    from miru_spark.query.bm25 import search
    from miru_spark.query.filters import expand_multiterm

    rows = [
        ("c0", 0, "user", "spark shuffle scan", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "small sort slow", None, "2024-01-01 00:00:01"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)

    node = expand_multiterm(idx, Wildcard("s*a*"))
    assert isinstance(node, Or)
    assert all(isinstance(c, Term) for c in node.children)
    assert {c.value for c in node.children} == {"spark", "scan", "small"}
    # boost survives expansion
    nb = expand_multiterm(idx, Wildcard("s*a*", boost=2.0))
    assert all(c.boost == 2.0 for c in nb.children)
    # cap fallback keeps the original leaf
    assert expand_multiterm(idx, Wildcard("s*"), cap=2) == Wildcard("s*")
    # no-match leaf becomes an impossible exact term; query answers empty
    assert search(idx, "zz?qq", k=5).count() == 0
    # expanded and (cap-forced) scan plans agree end-to-end
    a = {r["docint"] for r in search(idx, "s*a*k", k=10).collect()}
    assert a == {r["docint"] for r in search(idx, Wildcard("s*a*k"), k=10).collect()}


def test_suggest_terms(spark):
    """Autocomplete: df-ranked prefix completions, ties by term asc,
    min_df drops the long tail."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.suggest import suggest_terms

    rows = [
        ("c0", 0, "user", "spark spark spark sort", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "spark sort slow", None, "2024-01-01 00:00:01"),
        ("c0", 2, "user", "sort alpha", None, "2024-01-01 00:00:02"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)
    got = [(r["term"], r["df"]) for r in suggest_terms(idx, "s", k=10).collect()]
    assert got == [("sort", 3), ("spark", 2), ("slow", 1)]
    got2 = [r["term"] for r in suggest_terms(idx, "s", k=10, min_df=2).collect()]
    assert got2 == ["sort", "spark"]


def test_regexp_terms(spark):
    """'/pattern/' regexp leaves: anchored dictionary match, rewritten
    to exact term sets, usable in field groups and as row predicates."""
    from miru_spark.index import InvertedIndex
    from miru_spark.query.ast import Or, Regexp, Term
    from miru_spark.query.bm25 import search
    from miru_spark.query.filters import expand_multiterm, row_predicate
    from miru_spark.query.parser import parse_query
    from miru_spark.tokenize import tokens_col

    assert parse_query("/sp.rk/^2") == Regexp("sp.rk", boost=2.0)

    rows = [
        ("c0", 0, "user", "spark shuffle scan", None, "2024-01-01 00:00:00"),
        ("c0", 1, "user", "small sort slow", None, "2024-01-01 00:00:01"),
        ("c0", 2, "assistant", "spork and scan", None, "2024-01-01 00:00:02"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    idx = InvertedIndex.build(turns, cache=False)

    node = expand_multiterm(idx, Regexp("s.a[nr]k?"))
    assert isinstance(node, Or)
    assert {c.value for c in node.children} == {"scan", "spark"}

    for q, want in [
        ("/s.a[nr]k?/", {0, 2}),
        ("/s.a[nr]k?/ AND role:user", {0}),
        ("role:(/us.r/)", {0, 1}),
    ]:
        got = {r["turn_idx"] for r in search(idx, q, k=10).collect()}
        assert got == want, q
        rp = {
            r["turn_idx"]
            for r in turns.where(
                row_predicate(parse_query(q), tokens_col("text"))
            ).collect()
        }
        assert rp == want, f"row predicate {q}"


def test_synonym_expansion_equals_explicit_or(small_turns):
    from miru_spark.index import InvertedIndex
    from miru_spark.query.bm25 import search

    idx = InvertedIndex.build(small_turns)
    try:
        a = search(
            idx, "w00003", k=10, synonyms={"w00003": ["w00004"]}
        ).toPandas()
        b = search(idx, "w00003 OR w00004", k=10).toPandas()
        assert list(a["docint"]) == list(b["docint"])
        for x, y in zip(a["score"], b["score"]):
            assert abs(x - y) < 1e-9
    finally:
        idx.unpersist()


def test_synonym_not_expanded_under_negation(small_turns):
    from miru_spark.query.ast import And, Not, Or, Term, expand_synonyms
    from miru_spark.query.parser import parse_query

    node = parse_query("w00001 AND NOT w00002")
    out = expand_synonyms(
        node, {"w00001": ["w00009"], "w00002": ["w00008"]}
    )
    assert isinstance(out, And)
    pos, neg = out.children
    # positive leaf expanded to an OR, negated leaf untouched
    assert isinstance(pos, Or) and {t.value for t in pos.children} == {
        "w00001",
        "w00009",
    }
    assert isinstance(neg, Not) and isinstance(neg.child, Term)
    assert neg.child.value == "w00002"


def test_nonlatin_query_terms_reach_their_analyzer():
    """A non-latin query term is invisible to the LogMill pre-tokenizer
    ([a-z0-9']+) — the parser must pre-split with the index analyzer's
    tokenizer so the term reaches its stemmer instead of raising
    'analyzes to nothing' (TermTokenizer.java:34-54: the analyzer owns
    query tokenization)."""
    import pytest

    from miru_spark.query.ast import And, Phrase, Prefix, Term
    from miru_spark.query.parser import QueryParseError, parse_query

    # ru: inflected cyrillic stems like the index side
    assert parse_query("лисы", "ru") == Term("лис")
    assert parse_query("Быстрые лисы", "ru") == And(
        (Term("быстр"), Term("лис"))
    )
    # mixed script in one query: latin passes through the ru analyzer
    assert parse_query("лисы spark", "ru") == And(
        (Term("лис"), Term("spark"))
    )
    # phrases pre-split per word, then stem in place
    assert parse_query('"быстрые лисы"', "ru") == Phrase(("быстр", "лис"))
    # multi-term queries stay UNstemmed (Lucene: not analyzed)
    assert parse_query("лисы*", "ru") == Prefix("лисы")
    # cjk runs survive to analyze_node, which bigrams them
    assert parse_query("狐跳", "cjk") == Term("狐跳")
    n = parse_query("中文处", "cjk")
    assert isinstance(n, And) and {c.value for c in n.children} == {
        "中文",
        "文处",
    }
    # greek normalization chain applies at pre-split (final sigma)
    assert parse_query("πόλεις*", "gr") == Prefix("πόλεισ")
    # the standard analyzer keeps its exact old behavior: loud error
    with pytest.raises(QueryParseError):
        parse_query("лисы")
