"""Mini query parser — the Lucene QueryParser analog the reference's
tests drive queries through (SimpleFDBDirectoryTest.java uses
`QueryParser(field, analyzer).parse(...)`).

Grammar (a practical subset):

    query   := clause+
    clause  := [+|-] [FIELD:] ( "phrase text" | word )

- ``+`` = MUST, ``-`` = MUST_NOT, bare = SHOULD (BooleanQuery occurs);
- ``FIELD:`` overrides the default field for that clause;
- quoted text parses as a PhraseQuery on the clause's field;
- clause text is analyzed with the field's analyzer; a single unquoted
  word that analyzes to multiple terms keeps them in the same occur
  bucket (documented simplification of Lucene's graph queries); a word
  that analyzes to nothing (pure stopword) drops the clause.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CLAUSE_RE = re.compile(
    r'\s*(?P<occur>[+-]?)\s*(?:(?P<field>[A-Za-z_][\w]*):)?'
    r'(?:"(?P<phrase>[^"]*)"|(?P<word>[^\s"]+))'
)


@dataclass
class ParsedQuery:
    # (field, term) buckets for term clauses
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    # (occur, field, phrase_text) for quoted clauses
    phrases: list = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not (self.must or self.should or self.must_not or self.phrases)


def parse_query(q: str, default_field: str = "text") -> ParsedQuery:
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q or ""):
        occur = m.group("occur")
        f = m.group("field") or default_field
        if m.group("phrase") is not None:
            out.phrases.append(
                ("must_not" if occur == "-" else "must" if occur == "+" else "should",
                 f, m.group("phrase"))
            )
        else:
            bucket = (
                out.must_not if occur == "-"
                else out.must if occur == "+"
                else out.should
            )
            bucket.append((f, m.group("word")))
    return out
