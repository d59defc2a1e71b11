"""Ontology / curated-mapping dictionaries + the lexical-match index.

Replaces the reference's live ZOOMA / OLS services (SURVEY.md §2 S5/S6,
ST4): the dictionary is built offline into Arrow tables, broadcast once
via ``ray.put`` (small side) or hash-sharded by actor rank (large
side), and consulted in-process by the LinkerActor — no RPC on the
data path.

Fixture content: FIXTURES.md §3.1/§3.2 (the frozen mini-ontology the
linking conformance corpus is defined against).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.normalize import norm_str, punct_strip_str, token_sig
from ..schemas import CURATED_MAPPINGS, ONTOLOGY_TERMS

OBO = "http://purl.obolibrary.org/obo/"
EFO = "http://www.ebi.ac.uk/efo/"

# FIXTURES.md §3.1 — (uri, label, synonyms, ontology, is_obsolete)
FIXTURE_TERMS: list[tuple[str, str, list[str], str, bool]] = [
    (OBO + "NCBITaxon_9606", "Homo sapiens", ["human", "h. sapiens"], "NCBITaxon", False),
    (OBO + "NCBITaxon_10090", "Mus musculus", ["mouse", "house mouse"], "NCBITaxon", False),
    (EFO + "EFO_0000400", "diabetes mellitus", ["diabetes"], "EFO", False),
    (EFO + "EFO_0001265", "liver", ["hepatic tissue"], "EFO", False),
    (OBO + "PATO_0000384", "male", ["M"], "PATO", False),
    (OBO + "PATO_0000383", "female", ["F"], "PATO", False),
    (OBO + "UO_0000034", "week", ["weeks", "wk"], "UO", False),
    (OBO + "UO_0000022", "milligram", ["mg"], "UO", False),
    (OBO + "UO_0000027", "degree Celsius", ["celsius", "°C", "C"], "UO", False),
    (EFO + "EFO_OBS01", "old term", [], "EFO", True),
]

# FIXTURES.md §3.2 — curated exact (type, value) tier.
FIXTURE_CURATED: list[tuple[str, str, str, str]] = [
    ("organism", "homo sapiens", OBO + "NCBITaxon_9606", "HIGH"),
    ("disease", "t2d", EFO + "EFO_0000400", "HIGH"),
]


# FIXTURES.md §3.4 — direct is-a (subsumption) edges of the frozen
# mini-ontology, using the public OBO/EFO parent terms. Ancestor URIs
# are NOT lexical-match targets (they carry no label/synonym rows) —
# they exist only for closure expansion.
FIXTURE_IS_A: list[tuple[str, str]] = [
    (OBO + "NCBITaxon_9606", OBO + "NCBITaxon_9605"),    # Homo sapiens → Homo
    (OBO + "NCBITaxon_9605", OBO + "NCBITaxon_40674"),   # Homo → Mammalia
    (OBO + "NCBITaxon_10090", OBO + "NCBITaxon_10088"),  # Mus musculus → Mus
    (OBO + "NCBITaxon_10088", OBO + "NCBITaxon_40674"),  # Mus → Mammalia
    (EFO + "EFO_0000400", EFO + "EFO_0000589"),  # diabetes mellitus → metabolic disease
    (EFO + "EFO_0000589", EFO + "EFO_0000408"),  # metabolic disease → disease
    (EFO + "EFO_0001265", OBO + "UBERON_0000062"),   # liver → organ
    (OBO + "PATO_0000384", OBO + "PATO_0001894"),    # male → phenotypic sex
    (OBO + "PATO_0000383", OBO + "PATO_0001894"),    # female → phenotypic sex
    (OBO + "UO_0000034", OBO + "UO_0000003"),        # week → time unit
    (OBO + "UO_0000022", OBO + "UO_0000002"),        # milligram → mass unit
    (OBO + "UO_0000027", OBO + "UO_0000005"),        # degree Celsius → temperature unit
]


def fixture_is_a() -> pa.Table:
    return pa.table({
        "child_uri": pa.array([c for c, _ in FIXTURE_IS_A], pa.string()),
        "parent_uri": pa.array([p for _, p in FIXTURE_IS_A], pa.string()),
    })


def ancestor_closure(is_a: pa.Table | None = None) -> pa.Table:
    """Transitive closure of the is-a DAG as a flat (uri, anc_uri)
    table — ontology-sized state, computed once in-process and
    broadcast (`ray.put`) like every other dictionary here; the
    DATA-side expansion over the triple stream is the distributed part
    (``stages.triples.expand_ancestors``). Raises on cycles."""
    is_a = is_a if is_a is not None else fixture_is_a()
    parents: dict[str, set[str]] = {}
    for c, p in zip(is_a.column("child_uri").to_pylist(),
                    is_a.column("parent_uri").to_pylist()):
        parents.setdefault(c, set()).add(p)
    out_c, out_a = [], []
    memo: dict[str, frozenset] = {}

    def ancestors(n: str, path: tuple = ()) -> frozenset:
        if n in memo:
            return memo[n]
        if n in path:
            raise ValueError(f"ancestor_closure: is-a cycle through {n!r}")
        acc: set[str] = set()
        for p in parents.get(n, ()):
            acc.add(p)
            acc |= ancestors(p, path + (n,))
        memo[n] = frozenset(acc)
        return memo[n]

    for n in sorted(parents):
        for a in sorted(ancestors(n)):
            out_c.append(n)
            out_a.append(a)
    return pa.table({"uri": pa.array(out_c, pa.string()),
                     "anc_uri": pa.array(out_a, pa.string())})


def fixture_ontology_terms() -> pa.Table:
    uris, labels, syns, onts, obs = zip(*FIXTURE_TERMS)
    return pa.table(
        {
            "term_uri": pa.array(uris, pa.string()),
            "label": pa.array(labels, pa.string()),
            "synonyms": pa.array([list(s) for s in syns], pa.list_(pa.string())),
            "ontology": pa.array(onts, pa.string()),
            "is_obsolete": pa.array(obs, pa.bool_()),
        },
        schema=ONTOLOGY_TERMS,
    )


def fixture_curated_mappings() -> pa.Table:
    ct, vn, uri, conf = zip(*FIXTURE_CURATED)
    return pa.table(
        {
            "char_type": pa.array(ct, pa.string()),
            "value_norm": pa.array(vn, pa.string()),
            "term_uri": pa.array(uri, pa.string()),
            "confidence": pa.array(conf, pa.string()),
        },
        schema=CURATED_MAPPINGS,
    )


@dataclass
class OntologyIndex:
    """In-memory lexical-match index (one per LinkerActor, built once).

    Tier maps (FIXTURES.md §3.3): curated exact → label exact →
    synonym exact → punct-stripped → token-set. Obsolete terms are
    filtered at build. Values are lists of (term_uri, label) sorted by
    term_uri asc so tie-breaks are deterministic.
    """

    curated: dict[tuple[str, str], tuple[str, str, str]] = field(default_factory=dict)
    accession_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    label_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    syn_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    punct_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    tokenset_map: dict[str, list[tuple[str, str]]] = field(default_factory=dict)
    labels_by_uri: dict[str, str] = field(default_factory=dict)

    @classmethod
    def build(cls, terms: pa.Table, curated: pa.Table | None = None) -> "OntologyIndex":
        idx = cls()

        def add(m: dict, k: str, uri: str, label: str) -> None:
            if k:
                m.setdefault(k, []).append((uri, label))

        for row in terms.to_pylist():
            if row["is_obsolete"]:
                continue  # obsolete terms never win (FIXTURES §3.3)
            uri, label = row["term_uri"], row["label"]
            idx.labels_by_uri[uri] = label
            # J2/S6: explicit (ontology, accession) resolution — the
            # reference resolves declared OntologyEntry(source, accession)
            # pairs to canonical URIs via OLS (SURVEY.md §2 S6/J2). The
            # accession key is the URI's terminal segment, normalized
            # ("NCBITaxon_9606" matches "ncbitaxon:9606" / "_9606" forms).
            acc = uri.rstrip("/").rsplit("/", 1)[-1]
            add(idx.accession_map, norm_str(acc.replace(":", "_")), uri, label)
            ln = norm_str(label)
            add(idx.label_map, ln, uri, label)
            add(idx.punct_map, punct_strip_str(ln), uri, label)
            add(idx.tokenset_map, token_sig(ln), uri, label)
            for syn in row["synonyms"] or []:
                sn = norm_str(syn)
                add(idx.syn_map, sn, uri, label)
                add(idx.punct_map, punct_strip_str(sn), uri, label)
                add(idx.tokenset_map, token_sig(sn), uri, label)
        for m in (idx.accession_map, idx.label_map, idx.syn_map, idx.punct_map, idx.tokenset_map):
            for k in m:
                m[k] = sorted(set(m[k]))
        if curated is not None:
            for row in curated.to_pylist():
                uri = row["term_uri"]
                idx.curated[(norm_str(row["char_type"]), norm_str(row["value_norm"]))] = (
                    uri,
                    idx.labels_by_uri.get(uri, uri),
                    row["confidence"],
                )
        return idx

    # ------------------------------------------------------------------
    def _tier_arrays(self):
        """Arrow key arrays + winner columns per tier, built lazily once
        per index (the pc.index_in side of the vectorized cascade)."""
        import numpy as np

        cached = getattr(self, "_tiers", None)
        if cached is not None:
            return cached

        def mk(m: dict, conf: str, score: float, prov: str):
            ks = list(m)
            return {
                "keys": pa.array(ks, pa.string()),
                "uri": np.array([m[k][0][0] for k in ks], object),
                "label": np.array([m[k][0][1] for k in ks], object),
                "conf": np.array([conf] * len(ks), object),
                "score": np.full(len(ks), score),
                "prov": prov,
            }

        from ..functions.normalize import KEY_SEP

        ck = list(self.curated)
        tiers = [
            ("curated", {
                "keys": pa.array([t + KEY_SEP + v for t, v in ck], pa.string()),
                "uri": np.array([self.curated[k][0] for k in ck], object),
                "label": np.array([self.curated[k][1] for k in ck], object),
                "conf": np.array([self.curated[k][2] for k in ck], object),
                "score": np.full(len(ck), 1.0),
                "prov": "curated",
            }),
            ("resolver", mk(self.accession_map, "HIGH", 0.95, "resolver")),
            ("label", mk(self.label_map, "GOOD", 0.9, "label")),
            ("synonym", mk(self.syn_map, "GOOD", 0.85, "synonym")),
            ("punct", mk(self.punct_map, "MEDIUM", 0.7, "punct")),
            ("tokenset", mk(self.tokenset_map, "MEDIUM", 0.65, "tokenset")),
        ]
        self._tiers = tiers
        return tiers

    # -- opt-in fuzzy tier (SURVEY §2.4 scoring note: "fuzzy≥θ=LOW") --
    # constants (FIXTURES §3.5): candidate set = normalized labels +
    # synonyms; accept when Levenshtein d ≤ 1 (value ≤ 8 chars) or
    # d ≤ 2, and d < len(value); winner = min (d, key, uri);
    # confidence LOW, score 0.45 − 0.1·d, provenance "fuzzy".
    def _fuzzy_keys(self):
        cached = getattr(self, "_fuzzy", None)
        if cached is None:
            merged: dict[str, list] = {}
            for m in (self.label_map, self.syn_map):
                for k, v in m.items():
                    merged.setdefault(k, []).extend(v)
            ks = sorted(merged)
            import pandas as pd

            cached = (pd.Series(ks),
                      [sorted(set(merged[k]))[0] for k in ks])
            self._fuzzy = cached
        return cached

    def fuzzy_lookup(self, value_norm: str):
        """Best fuzzy label/synonym match for one normalized value, or
        None. Deterministic: (dist, key, uri) ascending."""
        from ..stages.similarity import _lev_batch

        keys, winners = self._fuzzy_keys()
        if len(keys) == 0 or not value_norm:
            return None
        d = _lev_batch(value_norm, keys)
        dmax = 1 if len(value_norm) <= 8 else 2
        ok = (d <= dmax) & (d < len(value_norm))
        if not ok.any():
            return None
        import numpy as np

        cand = np.flatnonzero(ok)
        best = cand[np.lexsort((keys.to_numpy()[cand], d[cand]))[0]]
        uri, label = winners[best]
        return (uri, label, "LOW", 0.45 - 0.1 * float(d[best]), "fuzzy")

    def lookup_batch(self, char_types: pa.Array, value_norms: pa.Array,
                     fuzzy: bool = False):
        """Vectorized twin of ``lookup`` (round-1 verdict item 8): the
        tier cascade runs as one ``pc.index_in`` per tier over the
        still-unresolved rows' transformed keys. Returns parallel
        (uri, label, conf, score, prov) numpy arrays with None/0 for
        misses. Parity with the scalar path is pinned by tests."""
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.normalize import KEY_SEP, punct_strip_array, token_sig_array

        n = len(value_norms)
        uri = np.full(n, None, object)
        label = np.full(n, None, object)
        conf = np.full(n, None, object)
        prov = np.full(n, None, object)
        score = np.zeros(n)
        unresolved = np.ones(n, bool)

        def transform(name: str, ct: pa.Array, vn: pa.Array) -> pa.Array:
            if name == "curated":
                return pc.binary_join_element_wise(ct, vn, KEY_SEP)
            if name == "resolver":
                return pc.replace_substring(
                    pc.replace_substring(vn, ":", "_"), " ", "_")
            if name in ("label", "synonym"):
                return vn
            if name == "punct":
                return punct_strip_array(vn)
            return token_sig_array(vn)

        for name, tier in self._tier_arrays():
            if not unresolved.any():
                break
            if len(tier["keys"]) == 0:
                continue
            # compact to the still-unresolved subset BEFORE the tier's
            # transform — the expensive kernels (punct strip, token
            # signature with its lexsort) only ever see survivors, so
            # the cascade's cost shrinks as tiers resolve
            live = np.flatnonzero(unresolved)
            take = pa.array(live, pa.int64())
            vn_live = value_norms.take(take)
            ct_live = char_types.take(take) if name == "curated" else None
            idx = pc.index_in(transform(name, ct_live, vn_live),
                              value_set=tier["keys"])
            idxn = np.asarray(idx.to_numpy(zero_copy_only=False), dtype="float64")
            hitl = ~np.isnan(idxn)
            if not hitl.any():
                continue
            rows = live[hitl]
            ii = idxn[hitl].astype(np.int64)
            uri[rows] = tier["uri"][ii]
            label[rows] = tier["label"][ii]
            conf[rows] = tier["conf"][ii]
            score[rows] = tier["score"][ii]
            prov[rows] = tier["prov"]
            unresolved[rows] = False
        if fuzzy and unresolved.any():
            # per-miss loop is fine: inputs are DISTINCT keys (≪ rows)
            # and each miss runs the batch-vectorized DP against the
            # whole label list at once
            vals = value_norms.to_pylist()
            for i in np.flatnonzero(unresolved):
                hit = self.fuzzy_lookup(vals[i] or "")
                if hit is not None:
                    uri[i], label[i], conf[i], score[i], prov[i] = hit
        return uri, label, conf, score, prov

    def lookup(self, char_type: str, value_norm: str, fuzzy: bool = False):
        """Resolve one normalized (type, value) → (uri, label, confidence,
        score, provenance) or None. Tier order per FIXTURES.md §3.3;
        ties within a tier broken by (score desc, term_uri asc) — the
        maps store uri-ascending lists, so [0] is the winner."""
        hit = self.curated.get((char_type, value_norm))
        if hit:
            return (hit[0], hit[1], hit[2], 1.0, "curated")
        # J2 resolver tier: value is an explicit accession ("NCBITaxon:9606",
        # "NCBITaxon_9606") → canonical URI, HIGH (reference confidence for
        # declared ontology entries).
        c = self.accession_map.get(value_norm.replace(":", "_").replace(" ", "_"))
        if c:
            return (c[0][0], c[0][1], "HIGH", 0.95, "resolver")
        c = self.label_map.get(value_norm)
        if c:
            return (c[0][0], c[0][1], "GOOD", 0.9, "label")
        c = self.syn_map.get(value_norm)
        if c:
            return (c[0][0], c[0][1], "GOOD", 0.85, "synonym")
        c = self.punct_map.get(punct_strip_str(value_norm))
        if c:
            return (c[0][0], c[0][1], "MEDIUM", 0.7, "punct")
        c = self.tokenset_map.get(token_sig(value_norm))
        if c:
            return (c[0][0], c[0][1], "MEDIUM", 0.65, "tokenset")
        if fuzzy:
            return self.fuzzy_lookup(value_norm)
        return None
