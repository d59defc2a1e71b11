"""OBO flat-file ontology ingestion (public OBO 1.2/1.4 format).

The fixtures in ``dictionaries.py`` stand in for EFO/NCBITaxon-style
vocabularies; this module loads REAL ones: ``parse_obo`` turns a
``.obo`` file (the distribution format of GO, UO, PATO, NCBITaxon,
EFO exports) into exactly the two tables the linker stack consumes —
``ONTOLOGY_TERMS`` (term_uri, label, synonyms, ontology, is_obsolete)
and an ``is_a`` edge table — so ``OntologyIndex.build`` and
``ancestor_closure`` run unchanged on a user-supplied ontology.

Parsing rules (the subset every real OBO file exercises):
* ``[Term]`` stanzas only (``[Typedef]``/``[Instance]`` skipped);
* ``id:`` CURIE → PURL by the standard OBO rule
  (``GO:0008150`` → ``http://purl.obolibrary.org/obo/GO_0008150``);
* ``name:`` → label (comments after `` ! `` stripped everywhere);
* ``synonym: "text" SCOPE [xrefs]`` → synonyms filtered to the
  requested scopes (default EXACT+RELATED), quote escapes (``\\"``)
  unescaped;
* ``is_a: TARGET`` → one edge (child_uri, parent_uri);
* ``is_obsolete: true`` keeps the term row (the index filters it —
  same contract as the fixture table) but drops its edges.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..schemas import ONTOLOGY_TERMS

OBO_PURL = "http://purl.obolibrary.org/obo/"

_SYN_RE = re.compile(
    r'^"((?:[^"\\]|\\.)*)"\s*([A-Z]+)?')


def _curie_to_uri(curie: str) -> str:
    if curie.startswith("http://") or curie.startswith("https://"):
        return curie
    return OBO_PURL + curie.replace(":", "_")


def parse_obo(
    text_or_path: str,
    synonym_scopes: "tuple[str, ...]" = ("EXACT", "RELATED"),
) -> "tuple[pa.Table, pa.Table]":
    """Parse OBO content (a path to a ``.obo`` file, or the raw text
    itself when it contains a newline) → ``(terms_table, is_a_table)``
    in the linker's native schemas. Terms without an id or name are
    skipped; duplicate stanza ids keep the first occurrence."""
    if "\n" in text_or_path:
        text = text_or_path
    else:
        with open(text_or_path, encoding="utf-8") as f:
            text = f.read()

    terms: "dict[str, dict]" = {}
    edges: "list[tuple[str, str]]" = []
    cur: "dict | None" = None
    in_term = False

    def flush():
        nonlocal cur
        if in_term and cur and cur.get("id") and cur.get("name") \
                and cur["id"] not in terms:
            terms[cur["id"]] = cur
            if not cur["obsolete"]:
                for p in cur["parents"]:
                    edges.append((cur["id"], p))
        cur = None

    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("!"):
            continue
        if line.startswith("["):
            flush()
            in_term = line == "[Term]"
            cur = {"id": None, "name": None, "syns": [],
                   "obsolete": False, "parents": []} if in_term \
                else None
            continue
        if not in_term or cur is None or not line:
            continue
        # strip trailing OBO comments (" ! human-readable"), but not
        # inside the quoted synonym text (handled by the regex below)
        if ":" not in line:
            continue
        tag, _, val = line.partition(":")
        tag = tag.strip()
        val = val.strip()
        if tag == "id":
            cur["id"] = val.split(" ! ")[0].strip()
        elif tag == "name":
            cur["name"] = val.split(" ! ")[0].strip()
        elif tag == "synonym":
            m = _SYN_RE.match(val)
            if m:
                scope = m.group(2) or "RELATED"
                if scope in synonym_scopes:
                    cur["syns"].append(
                        m.group(1).replace('\\"', '"'))
        elif tag == "is_a":
            tgt = val.split(" ! ")[0].split("{")[0].strip()
            if tgt:
                cur["parents"].append(tgt)
        elif tag == "is_obsolete" and val.split(" ! ")[0].strip() \
                == "true":
            cur["obsolete"] = True
    flush()

    rows = sorted(terms.values(), key=lambda r: r["id"])
    terms_tbl = pa.table({
        "term_uri": pa.array(
            [_curie_to_uri(r["id"]) for r in rows], pa.string()),
        "label": pa.array([r["name"] for r in rows], pa.string()),
        "synonyms": pa.array([r["syns"] for r in rows],
                             pa.list_(pa.string())),
        "ontology": pa.array(
            [r["id"].split(":")[0] if ":" in r["id"] else "obo"
             for r in rows], pa.string()),
        "is_obsolete": pa.array([r["obsolete"] for r in rows],
                                pa.bool_()),
    }, schema=ONTOLOGY_TERMS)
    edges.sort()
    is_a = pa.table({
        "child_uri": pa.array([_curie_to_uri(c) for c, _ in edges],
                              pa.string()),
        "parent_uri": pa.array([_curie_to_uri(p) for _, p in edges],
                               pa.string())})
    return terms_tbl, is_a
