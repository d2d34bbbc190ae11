"""SimpleQueryParser — the error-tolerant end-user query syntax.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java``. Unlike the classic parser, this one
NEVER raises on malformed input: "a person should be able to type
whatever they want ... and this parser will do its best to interpret
what to search for no matter how poorly composed the request may be"
(SimpleQueryParser.java:38-45). Operators:

- ``+``  AND between tokens          (``token1+token2``)
- ``|``  OR between tokens           (``token1|token2``)
- ``-``  negates the NEXT token      (``-token``; must be adjacent —
         even whitespace between ``-`` and the token drops the negation,
         SimpleQueryParser.java:223-226)
- ``"``  phrase                      (``"t1 t2"``, ``"t1 t2"~N`` = slop)
- ``*``  trailing = prefix query     (``term*``)
- ``~N`` trailing = fuzzy query      (``term~1``; bare ``~`` = 2, capped
         at LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE = 2;
         unparsable / negative N = 0 → plain term query)
- ``()`` precedence groups
- ``\\X`` escapes X everywhere

Operator precedence is "simple order from right to left": each change
of operator wraps the tree built so far as ONE clause of a new parent
(SimpleQueryParser.java:460-472), so ``a | b + c`` evaluates
``(a OR b) AND c``.

Error tolerance, matching the reference case by case:

- unmatched ``(``: the paren is extraneous, content re-parsed inline
  (consumeSubQuery, java:266-269)
- stray ``)``: skipped (java:172-174)
- unmatched ``"``: the quote is extraneous, content re-lexed as tokens
  (consumePhrase, java:331-334)
- empty ``()`` / ``""``: resets any pending operator (java:270-276)
- ``+``/``|`` with no preceding token, or doubled: ignored
  (java:178-199)
- ``--token``: double negation cancels (java:200-204, ``state.not``
  parity)

Output is this engine's query tree (:mod:`lucene_spark.plans.query`
nodes); a negated token becomes ``BoolQ(should=(MatchAllQ(),),
must_not=(branch,))`` exactly like buildQueryTree's MUST_NOT +
MatchAllDocsQuery wrapper (java:441-448). Multi-field search with
per-field weights mirrors the ``Map<String,Float> weights`` ctor:
every produced leaf is the OR over fields of the field-qualified query,
boosted by its weight (newDefaultQuery, java:544-558).
"""

from __future__ import annotations

import dataclasses as _dc

from ..functions.analysis import analyze_batch
from .query import (
    BoolQ, BoostQ, FuzzyQ, MatchAllQ, PhraseQ, PrefixQ, SloppyQ, TermQ,
    qualify_node,
)

__all__ = [
    "SimpleQueryParser", "parse_simple",
    "AND_OPERATOR", "NOT_OPERATOR", "OR_OPERATOR", "PREFIX_OPERATOR",
    "PHRASE_OPERATOR", "PRECEDENCE_OPERATORS", "ESCAPE_OPERATOR",
    "WHITESPACE_OPERATOR", "FUZZY_OPERATOR", "NEAR_OPERATOR",
]

# feature flags (SimpleQueryParser.java:109-128)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

# LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_MAX_EDITS = 2

_WS = " \t\n\r"

_MUST, _SHOULD = "MUST", "SHOULD"


class _State:
    """Parser state (SimpleQueryParser.State, java:632-650)."""

    __slots__ = ("data", "index", "length", "current_op", "previous_op",
                 "not_", "top")

    def __init__(self, data: str, index: int, length: int):
        self.data = data
        self.index = index
        self.length = length
        self.current_op = None
        self.previous_op = None
        self.not_ = 0
        self.top = None


class SimpleQueryParser:
    """Parse human-readable query syntax into this engine's query nodes.

    ``weights``: mapping of field → boost; ``None`` targets the default
    field unqualified (the single-field ctor with weight 1).
    ``flags``: bitmask of the ``*_OPERATOR`` constants; ``-1`` = all on.
    ``default_operator``: ``"should"`` (OR, the reference default) or
    ``"must"`` (AND) — the only two setDefaultOperator allows
    (java:624-630).
    """

    def __init__(self, weights: "dict[str, float] | None" = None,
                 flags: int = -1, default_operator: str = "should"):
        if default_operator not in ("should", "must"):
            raise ValueError(
                "invalid operator: only should or must are allowed")
        self.weights = weights
        self.flags = flags
        self.default_op = _SHOULD if default_operator == "should" else _MUST

    # ----------------------------------------------------------- entry

    def parse(self, text: str):
        """Returns a query node, MatchAllQ for ``*``, or None (match
        nothing) for input with no tokens (java:149-165)."""
        if text.strip() == "*":
            return MatchAllQ()
        state = _State(text, 0, len(text))
        self._parse_sub_query(state)
        return state.top

    # ------------------------------------------------- the state machine

    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub_query(self, state: _State) -> None:
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and self._has(PRECEDENCE_OPERATORS):
                self._consume_sub_query(state)
            elif c == ")" and self._has(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif c == '"' and self._has(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif c == "+" and self._has(AND_OPERATOR):
                # ignored if an op is already pending or nothing precedes
                if state.current_op is None and state.top is not None:
                    state.current_op = _MUST
                state.index += 1
            elif c == "|" and self._has(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = _SHOULD
                state.index += 1
            elif c == "-" and self._has(NOT_OPERATOR):
                # consecutive '-' negate each other; 'continue' skips the
                # reset below so adjacency is required (java:200-208)
                state.not_ += 1
                state.index += 1
                continue
            elif c in _WS and self._has(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            # not-negation needs the token IMMEDIATELY after the dashes
            state.not_ = 0

    def _consume_sub_query(self, state: _State) -> None:
        start = state.index = state.index + 1
        precedence = 1
        escaped = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opener is extraneous, re-parse inline
            state.index = start
        elif state.index == start:
            # '()' — the pending operator would have applied to it
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        start = state.index = state.index + 1
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and self._has(NEAR_OPERATOR)):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if state.index == state.length:
            # no closing quote: the opener is extraneous, re-lex inline
            state.index = start
        elif state.index == start:
            state.current_op = None
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self._has(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                # prefix iff the LAST char is an unescaped '*' with at
                # least one char before it
                prefix = bool(buf) and c == "*" and self._has(PREFIX_OPERATOR)
            escaped = False
            buf.append(state.data[state.index])
            state.index += 1
        if buf:
            token = "".join(buf)
            if fuzzy:
                edits = min(self._parse_fuzziness(state), _MAX_EDITS)
                branch = (self._new_default_query(token) if edits == 0
                          else self._new_fuzzy_query(token, edits))
            elif prefix:
                branch = self._new_prefix_query(token[:-1])
            else:
                branch = self._new_default_query(token)
            self._build_query_tree(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        """Slop / edit distance after ``~``: empty → 2, non-integer → 0,
        negative → 0 (java:487-525)."""
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        buf: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(state.data[state.index])
        try:
            fuzz = int("".join(buf)) if buf else 2
        except ValueError:
            fuzz = 0
        return max(fuzz, 0)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        return ((c == '"' and self._has(PHRASE_OPERATOR))
                or (c == "|" and self._has(OR_OPERATOR))
                or (c == "+" and self._has(AND_OPERATOR))
                or (c in "()" and self._has(PRECEDENCE_OPERATORS))
                or (c in _WS and self._has(WHITESPACE_OPERATOR)))

    # --------------------------------------------------- tree building

    def _build_query_tree(self, state: _State, branch) -> None:
        """Append a consumed branch to the tree (java:439-479): operator
        changes wrap the whole current tree as one clause of a new
        parent — the documented right-to-left precedence."""
        if branch is not None:
            if state.not_ % 2 == 1:
                branch = BoolQ(should=(MatchAllQ(),), must_not=(branch,))
            if state.top is None:
                state.top = branch
            else:
                if state.current_op is None:
                    state.current_op = self.default_op
                if state.previous_op != state.current_op:
                    state.top = (BoolQ(must=(state.top,))
                                 if state.current_op == _MUST
                                 else BoolQ(should=(state.top,)))
                if state.current_op == _MUST:
                    state.top = _dc.replace(
                        state.top, must=state.top.must + (branch,))
                else:
                    state.top = _dc.replace(
                        state.top, should=state.top.should + (branch,))
                state.previous_op = state.current_op
            # a null branch (token that analyzed to nothing) keeps the
            # pending operator for the next real token (java:440-479 —
            # the reset sits INSIDE the branch != null block)
            state.current_op = None

    # ------------------------------------------------------ leaf factories

    def _per_field(self, make):
        """newDefaultQuery's multi-field shape (java:544-558): the OR over
        fields of the per-field query, each boosted by its weight;
        single-clause output collapses (simplify, java:608-617)."""
        if self.weights is None:
            return make(None)
        clauses = []
        for fld, w in self.weights.items():
            q = make(fld)
            if q is None:
                continue
            if w != 1.0:
                q = BoostQ(q, boost=float(w))
            clauses.append(q)
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        return BoolQ(should=tuple(clauses))

    def _analyze(self, text: str) -> "list[tuple[str, int]]":
        b = analyze_batch([text])
        return list(zip(b.tok_terms.tolist(), b.tok_positions.tolist()))

    def _new_default_query(self, text: str):
        """QueryBuilder.createBooleanQuery with the default operator:
        one analyzed token → a term query; several → a boolean of term
        clauses with the default occur (NOT a phrase — that is the
        classic parser's choice, not this one's)."""
        toks = self._analyze(text)

        def make(fld):
            if not toks:
                return None
            if len(toks) == 1:
                node = TermQ(toks[0][0])
            elif self.default_op == _MUST:
                node = BoolQ(must=tuple(TermQ(w) for w, _ in toks))
            else:
                node = BoolQ(should=tuple(TermQ(w) for w, _ in toks))
            return node if fld is None else qualify_node(node, fld)

        return self._per_field(make)

    def _new_phrase_query(self, text: str, slop: int):
        """QueryBuilder.createPhraseQuery: exact phrase at slop 0, the
        sloppy (unordered-within-slop) matcher otherwise."""
        toks = self._analyze(text)

        def make(fld):
            if not toks:
                return None
            if len(toks) == 1:
                node = TermQ(toks[0][0])
            elif slop > 0:
                node = SloppyQ(terms=tuple(w for w, _ in toks),
                               offsets=tuple(p for _, p in toks), slop=slop)
            else:
                node = PhraseQ(terms=tuple(w for w, _ in toks),
                               offsets=tuple(p for _, p in toks))
            return node if fld is None else qualify_node(node, fld)

        return self._per_field(make)

    def _new_fuzzy_query(self, text: str, edits: int):
        # analyzer.normalize without tokenizing (java:561-574)
        term = text.lower()

        def make(fld):
            node = FuzzyQ(term, max_edits=edits)
            return node if fld is None else qualify_node(node, fld)

        return self._per_field(make)

    def _new_prefix_query(self, text: str):
        term = text.lower()

        def make(fld):
            node = PrefixQ(term)
            return node if fld is None else qualify_node(node, fld)

        return self._per_field(make)


def parse_simple(text: str, weights: "dict[str, float] | None" = None,
                 flags: int = -1, default_operator: str = "should"):
    """One-shot :class:`SimpleQueryParser` parse."""
    return SimpleQueryParser(weights, flags, default_operator).parse(text)
