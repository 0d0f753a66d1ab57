"""RDF triple parsing without rdflib — N-Triples + a pragmatic Turtle
subset — feeding the Ray-Data graph-metrics pipeline (``pipelines/rdf.py``).

Lifts the RDF family out of out-of-scope (SURVEY.md S6/J2/A20/D3). The
reference parses with rdflib and measures with networkx
(``/root/reference/stelardataprofiler/rdfGraph/profiler.py:287-309``);
neither library exists here, but both formats are public W3C specs:

- **N-Triples** (W3C REC): one triple per line,
  ``<iri> <iri> (<iri>|_:bnode|"literal"[^^<dt>|@lang]) .``
- **Turtle subset**: ``@prefix`` / ``PREFIX`` declarations, prefixed
  names, the ``a`` keyword (rdf:type), ``;`` predicate lists, ``,``
  object lists, comments, and plain/typed/lang literals. Nested blank
  nodes ``[...]`` and collections ``(...)`` are NOT supported (raise) —
  a documented gap; the reference's own example data uses none.

Triples land in an Arrow table ``(subject, predicate, object,
object_is_iri)`` — the engine's graph representation: a plain edge list
that shards across a cluster like any other table, instead of an
in-memory ``networkx`` object.
"""

from __future__ import annotations

import re

import pyarrow as pa

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLES_SCHEMA = pa.schema([
    ("subject", pa.string()),
    ("predicate", pa.string()),
    ("object", pa.string()),
    ("object_is_iri", pa.bool_()),   # IRI/bnode edge vs literal value
])

_IRI = r"<([^<>\s]*)>"
_BNODE = r"(_:[A-Za-z0-9][\w.-]*)"
_LITERAL = r'"((?:[^"\\]|\\.)*)"(?:\^\^<[^<>\s]*>|@[\w-]+)?'
_NT_LINE = re.compile(
    rf"^\s*(?:{_IRI}|{_BNODE})\s+{_IRI}\s+"
    rf"(?:{_IRI}|{_BNODE}|{_LITERAL})\s*\.\s*$")

_UNESCAPE = re.compile(r"\\([\\\"ntr])")
_UNESC_MAP = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r"}


def _unescape(s: str) -> str:
    return _UNESCAPE.sub(lambda m: _UNESC_MAP[m.group(1)], s)


def parse_ntriples(text: str) -> pa.Table:
    """Parse N-Triples text → triples table. Raises ValueError with the
    line number on malformed input."""
    subs, preds, objs, is_iri = [], [], [], []
    for lineno, line in enumerate(text.splitlines(), start=1):
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            raise ValueError(f"ntriples: malformed line {lineno}: "
                             f"{line[:80]!r}")
        s_iri, s_bn, p, o_iri, o_bn, o_lit = m.groups()
        subs.append(s_iri if s_iri is not None else s_bn)
        preds.append(p)
        if o_lit is not None:
            objs.append(_unescape(o_lit))
            is_iri.append(False)
        else:
            objs.append(o_iri if o_iri is not None else o_bn)
            is_iri.append(True)
    return pa.table({"subject": pa.array(subs, pa.string()),
                     "predicate": pa.array(preds, pa.string()),
                     "object": pa.array(objs, pa.string()),
                     "object_is_iri": pa.array(is_iri)},
                    schema=TRIPLES_SCHEMA)


# --- Turtle subset -----------------------------------------------------

_TTL_TOKEN = re.compile(
    r"""\s*(?:
        (?P<comment>\#[^\n]*) |
        (?P<iri><[^<>\s]*>) |
        (?P<literal>"(?:[^"\\]|\\.)*"(?:\^\^<[^<>\s]*>|\^\^[\w-]+:[\w-]+|@[\w-]+)?) |
        (?P<prefix_decl>@prefix|@base|PREFIX|BASE) |
        (?P<a>\ba\b) |
        (?P<pname>[\w-]*:[\w.-]*) |
        (?P<bnode>_:[A-Za-z0-9][\w.-]*) |
        (?P<punct>[;,.\[\]()])
    )""", re.VERBOSE)


def parse_turtle(text: str) -> pa.Table:
    """Parse the pragmatic Turtle subset → triples table.

    Supports prefix declarations, prefixed names, ``a``, ``;``/``,``
    lists and literals; raises ValueError on the unsupported nested
    constructs (``[...]`` / ``(...)``) or malformed syntax.
    """
    prefixes: dict[str, str] = {}
    subs, preds, objs, is_iri = [], [], [], []
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TTL_TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"turtle: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "comment":
            continue
        toks.append((kind, m.group(kind)))

    def resolve(kind: str, tok: str) -> tuple[str, bool]:
        if kind == "iri":
            return tok[1:-1], True
        if kind == "bnode":
            return tok, True
        if kind == "a":
            return RDF_TYPE, True
        if kind == "pname":
            pfx, _, local = tok.partition(":")
            if pfx not in prefixes:
                raise ValueError(f"turtle: undeclared prefix {pfx!r}:")
            return prefixes[pfx] + local, True
        if kind == "literal":
            body = tok[1:tok.rindex('"')]
            return _unescape(body), False
        raise ValueError(f"turtle: unexpected token {tok!r}")

    i = 0
    n = len(toks)
    while i < n:
        kind, tok = toks[i]
        if kind == "prefix_decl":
            decl = tok.lstrip("@").upper()
            if decl == "PREFIX":
                if i + 2 >= n or toks[i + 1][0] != "pname" \
                        or toks[i + 2][0] != "iri":
                    raise ValueError("turtle: malformed @prefix")
                pfx = toks[i + 1][1].rstrip(":")
                prefixes[pfx] = toks[i + 2][1][1:-1]
                i += 3
            else:  # @base — accept and ignore (absolute IRIs only)
                i += 2
            if i < n and toks[i] == ("punct", "."):
                i += 1
            continue
        if kind == "punct":
            if tok in "[]()":
                raise ValueError(
                    "turtle: blank-node/collection syntax not supported")
            raise ValueError(f"turtle: unexpected {tok!r}")
        subj, _ = resolve(kind, tok)
        i += 1
        while True:                       # predicate list (;)
            if i >= n:
                raise ValueError("turtle: truncated after subject")
            pk, ptok = toks[i]
            pred, p_iri = resolve(pk, ptok)
            if not p_iri:
                raise ValueError("turtle: literal in predicate position")
            i += 1
            while True:                   # object list (,)
                if i >= n:
                    raise ValueError("turtle: truncated after predicate")
                ok_, otok = toks[i]
                if ok_ == "punct":
                    raise ValueError(
                        "turtle: blank-node/collection syntax not supported"
                        if otok in "[]()" else
                        f"turtle: unexpected {otok!r} in object position")
                obj, o_iri = resolve(ok_, otok)
                subs.append(subj)
                preds.append(pred)
                objs.append(obj)
                is_iri.append(o_iri)
                i += 1
                if i < n and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < n and toks[i] == ("punct", ";"):
                i += 1
                if i < n and toks[i] == ("punct", "."):  # trailing ;
                    i += 1
                    break
                continue
            if i < n and toks[i] == ("punct", "."):
                i += 1
                break
            raise ValueError("turtle: expected ';' or '.' after object")
    return pa.table({"subject": pa.array(subs, pa.string()),
                     "predicate": pa.array(preds, pa.string()),
                     "object": pa.array(objs, pa.string()),
                     "object_is_iri": pa.array(is_iri)},
                    schema=TRIPLES_SCHEMA)


def namespace_of(iri: str) -> str:
    """Namespace = IRI up to (and incl.) the last '#' or '/' — the
    vocabulary grouping the reference's ``@prefix`` count approximates."""
    for sep in ("#", "/"):
        at = iri.rfind(sep)
        if at > len("https://") - 1:
            return iri[:at + 1]
    return iri
