"""Hearst-pattern relation extraction (r04 seventh sitting)."""

from __future__ import annotations

import pyarrow as pa

from biosd_feature_annotator_ray.stages.relations import extract_hearst


def _t(rows):
    return pa.Table.from_pylist(rows)


def _triples(out):
    return sorted(zip(out.column("doc_id").to_pylist(),
                      out.column("subj").to_pylist(),
                      out.column("obj").to_pylist(),
                      out.column("pattern").to_pylist()))


def test_such_as_list():
    out = extract_hearst(_t([
        {"doc_id": 1,
         "text": "we saw mammals such as dogs, cats and foxes today"}]))
    assert _triples(out) == [
        (1, "cats", "mammals", "such_as"),
        (1, "dogs", "mammals", "such_as"),
        (1, "foxes", "mammals", "such_as"),
    ]
    assert out.column("pred").to_pylist() == ["isa"] * 3


def test_including_and_especially():
    out = extract_hearst(_t([
        {"doc_id": 2, "text": "metals including iron, zinc"},
        {"doc_id": 3, "text": "fruits especially apples"}]))
    assert _triples(out) == [
        (2, "iron", "metals", "including"),
        (2, "zinc", "metals", "including"),
        (3, "apples", "fruits", "especially"),
    ]


def test_and_other_reversed_roles():
    out = extract_hearst(_t([
        {"doc_id": 4, "text": "oaks, pines and other trees grow"}]))
    assert _triples(out) == [
        (4, "oaks", "trees", "and_other"),
        (4, "pines", "trees", "and_other"),
    ]


def test_or_list_and_case_fold():
    out = extract_hearst(_t([
        {"doc_id": 5, "text": "Gems such as Rubies or Emeralds"}]))
    assert _triples(out) == [
        (5, "emeralds", "gems", "such_as"),
        (5, "rubies", "gems", "such_as"),
    ]


def test_multiple_matches_per_doc_and_no_match():
    out = extract_hearst(_t([
        {"doc_id": 6,
         "text": ("birds such as crows live here. "
                  "metals including tin are mined.")},
        {"doc_id": 7, "text": "no pattern in this text"},
        {"doc_id": 8, "text": None},
    ]))
    assert _triples(out) == [
        (6, "crows", "birds", "such_as"),
        (6, "tin", "metals", "including"),
    ]


def test_empty_batch_schema():
    out = extract_hearst(_t([{"doc_id": 9, "text": "plain words"}]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "subj", "pred", "obj",
                                "pattern"]


def test_multiword_hypernym_chunks():
    out = extract_hearst(_t([
        {"doc_id": 10,
         "text": "large wild mammals such as dogs and foxes"},
        {"doc_id": 11,
         "text": "stores of heavy metals including iron, zinc"}]))
    assert _triples(out) == [
        (10, "dogs", "large wild mammals", "such_as"),
        (10, "foxes", "large wild mammals", "such_as"),
        (11, "iron", "heavy metals", "including"),
        (11, "zinc", "heavy metals", "including"),
    ]


def test_leading_stopwords_stripped_from_chunk():
    out = extract_hearst(_t([
        {"doc_id": 12, "text": "we saw mammals such as dogs"},
        {"doc_id": 13, "text": "the stone fruits especially apples"}]))
    assert _triples(out) == [
        (12, "dogs", "mammals", "such_as"),
        (13, "apples", "stone fruits", "especially"),
    ]


def test_hearst_duckdb_parity_fuzz():
    """Randomized corpus replayed through the SAME regex grammar in
    DuckDB — the oracle-replayability contract, fuzzed."""
    import random

    import duckdb
    import pandas as pd

    from biosd_feature_annotator_ray.stages.relations import (
        HEARST_STOP_RE)

    rng = random.Random(77)
    nouns = ["dogs", "cats", "red foxes", "tall oaks", "iron",
             "apples", "the gems", "we", "saw", "many"]
    anchors = [" such as ", " including ", " especially ",
               " and other "]
    rows = []
    for i in range(120):
        words = [rng.choice(nouns) for _ in range(rng.randrange(1, 5))]
        sep = rng.choice([", ", " and ", " or ", " "])
        txt = (rng.choice(nouns) + rng.choice(anchors)
               + sep.join(words))
        rows.append({"doc_id": i, "text": txt})
    df = pd.DataFrame(rows)
    got = extract_hearst(pa.Table.from_pandas(df)).to_pandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)

    NP = r"(?:\w+ ){0,2}\w+"
    LIST = r"\w+(?:, \w+)*(?:,? (?:and|or) \w+)?"
    stop = HEARST_STOP_RE  # no backslashes — goes into SQL verbatim
    parts = []
    for num, (anchor, name) in enumerate(
            [("such as", "such_as"), ("including", "including"),
             ("especially", "especially")], start=1):
        pat = f"({NP}) {anchor} ({LIST})"
        parts.append(
            f"m{num} AS (SELECT doc_id, unnest(regexp_extract_all("
            f"lower(text), '{pat}')) AS m FROM t), "
            f"e{num} AS (SELECT doc_id, unnest(regexp_split_to_array("
            f"regexp_extract(m, '{pat}', 2), ',? (?:and|or) |, ')) AS"
            f" subj, regexp_replace(regexp_extract(m, '{pat}', 1),"
            f" '{stop}', '') AS obj, '{name}' AS pattern FROM m{num})")
    pat4 = r"(\w+(?:, \w+)*) and other (\w+)"
    parts.append(
        f"m4 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        f" '{pat4}')) AS m FROM t), "
        f"e4 AS (SELECT doc_id, unnest(regexp_split_to_array("
        f"regexp_extract(m, '{pat4}', 1), ',? (?:and|or) |, ')) AS"
        f" subj, regexp_extract(m, '{pat4}', 2) AS obj,"
        f" 'and_other' AS pattern FROM m4)")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "WITH " + ", ".join(parts)
        + " SELECT doc_id, subj, 'isa' AS pred, obj, pattern FROM"
          " (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL"
          " SELECT * FROM e3 UNION ALL SELECT * FROM e4)").df()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    got["doc_id"] = got["doc_id"].astype("int64")
    want["doc_id"] = want["doc_id"].astype("int64")
    assert got.equals(want), (len(got), len(want))
