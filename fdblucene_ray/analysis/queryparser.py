"""Mini query parser — the Lucene QueryParser analog the reference's
tests drive queries through (SimpleFDBDirectoryTest.java uses
`QueryParser(field, analyzer).parse(...)`).

Grammar (a practical subset):

    query   := clause+
    clause  := [+|-] [FIELD:] ( "phrase text" | word )

- ``+`` = MUST, ``-`` = MUST_NOT, bare = SHOULD (BooleanQuery occurs);
- ``FIELD:`` overrides the default field for that clause;
- quoted text parses as a PhraseQuery on the clause's field;
  ``"a b"~2`` sets the phrase slop (SloppyPhraseQuery analog);
- ``/pattern/`` = RegexpQuery (whole-term anchored);
- multi-term clauses: ``pre*`` = PrefixQuery, ``w?ld*card`` =
  WildcardQuery, ``term~`` / ``term~1`` = FuzzyQuery (default 2 edits)
  — lowercased but NOT analyzed, matching Lucene's expanded-term
  handling; evaluated constant-score (CONSTANT_SCORE_REWRITE);
- ``clause^2`` / ``"phrase"^1.5`` = query-time boost (Lucene boost
  syntax): the clause's score contribution is scaled by the factor
  (constant-score multi-term clauses contribute the boost itself);
- other clause text is analyzed with the field's analyzer; a single
  unquoted word that analyzes to multiple terms keeps them in the same
  occur bucket (documented simplification of Lucene's graph queries);
  a word that analyzes to nothing (pure stopword) drops the clause.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CLAUSE_RE = re.compile(
    r'\s*(?P<occur>[+-]?)\s*(?:(?P<field>[A-Za-z_][\w]*):)?'
    r'(?:"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?'
    r'|(?P<word>[^\s"]+))'
)
_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")


@dataclass
class ParsedQuery:
    # (field, term, boost) buckets for term clauses
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    # (occur, field, phrase_text, slop, boost) for quoted clauses
    # (``"a b"~2^1.5`` — Lucene slop-then-boost order; slop 0 = exact)
    phrases: list = field(default_factory=list)
    # (occur, field, kind, payload, boost): kind "prefix"|"wildcard"
    # with the pattern payload, or "fuzzy" with (term, max_edits)
    multiterm: list = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not (self.must or self.should or self.must_not
                    or self.phrases or self.multiterm)


def parse_query(q: str, default_field: str = "text") -> ParsedQuery:
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q or ""):
        occur = m.group("occur")
        f = m.group("field") or default_field
        if m.group("phrase") is not None:
            out.phrases.append(
                ("must_not" if occur == "-" else "must" if occur == "+" else "should",
                 f, m.group("phrase"), int(m.group("slop") or 0),
                 float(m.group("pboost") or 1.0))
            )
        else:
            w = m.group("word")
            oname = (
                "must_not" if occur == "-" else "must" if occur == "+" else "should"
            )
            boost = 1.0
            bm = _BOOST_RE.match(w)
            if bm and bm.group(1):
                w, boost = bm.group(1), float(bm.group(2))
            fz = re.fullmatch(r"([^*?~]+)~(\d)?", w)
            if len(w) >= 3 and w.startswith("/") and w.endswith("/"):
                # /regex/ = RegexpQuery (Lucene slash syntax); matches
                # whole terms, lowercased like the other expanded kinds
                out.multiterm.append((oname, f, "regexp", w[1:-1].lower(), boost))
            elif "*" in w or "?" in w:
                wl = w.lower()
                if wl.endswith("*") and wl.count("*") == 1 and "?" not in wl:
                    out.multiterm.append((oname, f, "prefix", wl[:-1], boost))
                else:
                    out.multiterm.append((oname, f, "wildcard", wl, boost))
            elif fz:
                out.multiterm.append(
                    (oname, f, "fuzzy",
                     (fz.group(1).lower(), int(fz.group(2) or 2)), boost)
                )
            else:
                bucket = (
                    out.must_not if occur == "-"
                    else out.must if occur == "+"
                    else out.should
                )
                bucket.append((f, w, boost))
    return out


# -------------------------------------------------- nested boolean grammar
#
# Lucene QueryParser's EXPLICIT-operator syntax with parentheses:
#
#     expr   := and_expr (OR and_expr)*
#     and_expr := unary (AND unary)*
#     unary  := NOT unary | atom
#     atom   := '(' expr ')' | [FIELD:] word
#
# (AND/OR/NOT are case-sensitive keywords, as in Lucene.) Produces a
# tree of ("or", [children]) / ("and", [children]) / ("not", child) /
# ("term", field, word) nodes; the word is analyzed at evaluation time
# with the field's chain. Scoring follows Lucene's translation: every
# positively-occurring term scores, NOT only excludes.

_TOK_RE = re.compile(r"\(|\)|[^\s()]+")


class QuerySyntaxError(ValueError):
    pass


def parse_boolean_expr(q: str, default_field: str = "text"):
    toks = _TOK_RE.findall(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        if pos >= len(toks):
            raise QuerySyntaxError(f"unexpected end of query: {q!r}")
        t = toks[pos]
        if expected is not None and t != expected:
            raise QuerySyntaxError(f"expected {expected!r}, got {t!r} in {q!r}")
        pos += 1
        return t

    def atom():
        t = peek()
        if t == "(":
            take("(")
            node = expr()
            take(")")
            return node
        if t in (None, ")", "AND", "OR", "NOT"):
            raise QuerySyntaxError(f"expected a term at {t!r} in {q!r}")
        word = take()
        field = default_field
        if ":" in word:
            f, rest = word.split(":", 1)
            if re.fullmatch(r"[A-Za-z_]\w*", f) and rest:
                field, word = f, rest
        return ("term", field, word)

    def unary():
        if peek() == "NOT":
            take("NOT")
            return ("not", unary())
        return atom()

    def and_expr():
        kids = [unary()]
        while peek() == "AND":
            take("AND")
            kids.append(unary())
        return kids[0] if len(kids) == 1 else ("and", kids)

    def expr():
        kids = [and_expr()]
        while peek() == "OR":
            take("OR")
            kids.append(and_expr())
        return kids[0] if len(kids) == 1 else ("or", kids)

    node = expr()
    if pos != len(toks):
        raise QuerySyntaxError(f"trailing input {toks[pos:]} in {q!r}")
    return node


# ------------------------------------------------------ unified grammar
#
# The FULL Lucene classic-QueryParser surface in ONE grammar — both
# syntaxes the reference's Lucene layer accepts in a single string
# (SimpleFDBDirectoryTest.java:152-155 drives QueryParser.parse, which
# mixes them freely):
#
#     +data (merge OR sort) -window "batch stream"~2^1.5 title:comp*
#
#     query  := clause*
#     clause := [AND|OR|&&|'||'] [+|-|NOT|!] atom [^boost]
#     atom   := '(' query ')' | [FIELD:] ( "phrase"[~slop] | word )
#
# Occur resolution follows Lucene's ``QueryParserBase.addClause``
# (public javadoc'd behavior, default operator OR):
#   - ``+`` or a preceding AND        -> MUST
#   - ``-`` / NOT / ``!``             -> MUST_NOT
#   - otherwise                       -> SHOULD
#   - a preceding AND also PROMOTES the previous clause SHOULD -> MUST
#     (``a AND b`` requires both); OR leaves neighbours untouched.
#
# Words classify exactly like the flat grammar: ``pre*`` prefix,
# ``w?ld*`` wildcard, ``term~``/``term~1`` fuzzy, ``/re/`` regexp —
# all constant-score (CONSTANT_SCORE_REWRITE); everything else is an
# analyzed term. AST nodes:
#   ("bool", [(occur, node), ...], boost)
#   ("term", field, word, boost)
#   ("phrase", field, text, slop, boost)
#   ("multiterm", field, kind, payload, boost)

_UNI_TOK_RE = re.compile(
    r'"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'   # phrase [~slop][^boost]
    r"|\(|\)"
    r'|\^\d+(?:\.\d+)?'                        # detached group boost
    r'|[^\s()]+'
)

_WORD_FIELD_RE = re.compile(r"^([A-Za-z_]\w*):(.+)$", re.S)


def _classify_word(field: str, word: str, boost: float):
    """One unquoted word -> term / multiterm AST node (same rules as
    the flat grammar's clause classification)."""
    fz = re.fullmatch(r"([^*?~]+)~(\d)?", word)
    if len(word) >= 3 and word.startswith("/") and word.endswith("/"):
        return ("multiterm", field, "regexp", word[1:-1].lower(), boost)
    if "*" in word or "?" in word:
        wl = word.lower()
        if wl.endswith("*") and wl.count("*") == 1 and "?" not in wl:
            return ("multiterm", field, "prefix", wl[:-1], boost)
        return ("multiterm", field, "wildcard", wl, boost)
    if fz:
        return (
            "multiterm", field, "fuzzy",
            (fz.group(1).lower(), int(fz.group(2) or 2)), boost,
        )
    return ("term", field, word, boost)


def parse_unified(q: str, default_field: str = "text"):
    """Parse the full mixed syntax into a ("bool", clauses, boost) tree."""
    toks = _UNI_TOK_RE.findall(q or "")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_group():
        """clause* until ')' or end -> ("bool", [(occur, node)], boost)."""
        clauses: list = []
        conj = None
        while True:
            t = peek()
            if t is None or t == ")":
                break
            if t in ("AND", "&&", "OR", "||"):
                if not clauses:
                    raise QuerySyntaxError(
                        f"query must not start with {t} in {q!r}"
                    )
                conj = "and" if t in ("AND", "&&") else "or"
                advance()
                continue
            mods = ""
            if t in ("NOT", "!"):
                mods = "-"
                advance()
                t = peek()
                if t is None or t == ")":
                    raise QuerySyntaxError(f"dangling NOT in {q!r}")
            node, mods2 = parse_atom()
            mods = mods or mods2
            # Lucene addClause: AND promotes the PREVIOUS clause
            if conj == "and" and clauses and clauses[-1][0] == "should":
                clauses[-1] = ("must", clauses[-1][1])
            if mods == "-":
                occur = "must_not"
            elif mods == "+" or conj == "and":
                occur = "must"
            else:
                occur = "should"
            clauses.append((occur, node))
            conj = None
        return ("bool", clauses, 1.0)

    def parse_atom():
        """Returns (node, mods) — mods from a +/-/! prefix glued to the
        token."""
        t = advance()
        mods = ""
        # prefix modifiers glued to the token: +word, -word, !word
        while t and t[0] in "+-!" and len(t) > 1 and not _looks_negative_number(t):
            mods = "-" if t[0] in "-!" else "+"
            t = t[1:]
        if t == "(":
            node = parse_group()
            if peek() == ")":
                advance()
            else:
                raise QuerySyntaxError(f"unbalanced '(' in {q!r}")
            nxt = peek()
            if nxt and nxt.startswith("^"):
                advance()
                node = (node[0], node[1], float(nxt[1:]))
            return node, mods
        if t in (")", None):
            raise QuerySyntaxError(f"unexpected {t!r} in {q!r}")
        field = default_field
        boost = 1.0
        if t.startswith('"'):
            return _parse_phrase_tok(t, field), mods
        fm = _WORD_FIELD_RE.match(t)
        if fm:
            field, t = fm.group(1), fm.group(2)
            if t.startswith('"'):
                # field:"phrase..." — token was split on whitespace, so
                # re-join until the closing quote variant appears
                rest = t
                while not re.match(_UNI_TOK_RE, rest) or not rest.startswith('"') or (
                    rest.count('"') < 2
                ):
                    nxt = peek()
                    if nxt is None:
                        raise QuerySyntaxError(f"unterminated phrase in {q!r}")
                    rest = rest + " " + advance()
                return _parse_phrase_tok(rest, field), mods
        bm = _BOOST_RE.match(t)
        if bm and bm.group(1):
            t, boost = bm.group(1), float(bm.group(2))
        return _classify_word(field, t, boost), mods

    def _parse_phrase_tok(tok: str, field: str):
        m = re.fullmatch(
            r'"([^"]*)"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?', tok
        )
        if not m:
            raise QuerySyntaxError(f"bad phrase token {tok!r} in {q!r}")
        return (
            "phrase", field, m.group(1), int(m.group(2) or 0),
            float(m.group(3) or 1.0),
        )

    def _looks_negative_number(t: str) -> bool:
        return bool(re.fullmatch(r"-\d+(\.\d+)?", t))

    node = parse_group()
    if pos != len(toks):
        raise QuerySyntaxError(f"trailing input {toks[pos:]} in {q!r}")
    return node
