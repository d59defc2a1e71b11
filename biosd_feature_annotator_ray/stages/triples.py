"""Triple emission + broadcast-back annotation join (SURVEY.md §3.4,
§4.2 step 4; output shape per BASELINE.json north_star).

After canonical links are computed over DISTINCT keys (a small table:
distinct keys ≪ mentions), they are broadcast once via ``ray.put`` and
joined back onto the mention stream map-side (pyarrow hash join per
batch) — no second all-to-all shuffle. If the canonical key map ever
outgrew memory the fallback is a bucketed hash-join shuffle on ``key``
(SURVEY.md §4.2), not needed at any tested scale.

Triple emission rules (golden-pinned, tests/golden/triples_v1.parquet):
  - linked key        → (url, char_type, term_uri)        obj_kind=uri
  - parsed kind≠none  → (url, char_type, lexical form)    obj_kind=kind,
                         typed sidecar cols + unit_uri populated
  - both              → BOTH rows (the reference likewise stores the
                         ontology annotation and the DataItem separately)
  - neither           → (url, char_type, value_norm)      obj_kind=string
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.normalize import KEY_SEP
from ..schemas import TRIPLES
from .linker import UNIT_TYPE


def unit_key_array(unit_text: pa.Array | pa.ChunkedArray):
    """unit_text → "(unit)|<norm>" key (null-preserving)."""
    from ..functions.normalize import norm_array

    return pc.binary_join_element_wise(
        pa.scalar(UNIT_TYPE), norm_array(unit_text), KEY_SEP
    )


_JOINER_CACHE: dict = {}


def make_joiner_fn(links_ref):
    """Task-based joiner: plain function for map_batches (elastic
    stateless tasks — no actor-pool spin-up), with a per-worker-process
    cache so the broadcast links table is fetched/partitioned once per
    process, not once per batch."""

    key = str(links_ref)

    def join_batch(batch: pa.Table) -> pa.Table:
        j = _JOINER_CACHE.get(key)
        if j is None:
            # single-entry cache: each run ray.puts a fresh links table,
            # so per-key caching leaked one links copy per run in every
            # long-lived worker process
            _JOINER_CACHE.clear()
            j = AnnotationJoiner(links_ref)
            _JOINER_CACHE[key] = j
        return j(batch)

    return join_batch


class AnnotationJoiner:
    """Actor-pool map_batches callable: joins broadcast canonical links
    (key → uri/conf/score and unit_key → unit_uri) onto mention batches
    and emits TRIPLES rows. ray.get in __init__ is zero-copy from the
    local object store, once per actor."""

    def __init__(self, links_ref):
        links: pa.Table = ray.get(links_ref) if not isinstance(links_ref, pa.Table) else links_ref
        is_unit = pc.starts_with(links.column("key"), UNIT_TYPE + KEY_SEP)
        self.links = links.filter(pc.invert(is_unit)).select(
            ["key", "term_uri", "confidence", "score"]
        )
        self.unit_links = (
            links.filter(is_unit)
            .select(["key", "term_uri"])
            .rename_columns(["__unit_key", "unit_uri"])
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.append_column("__unit_key", unit_key_array(batch.column("unit_text")))
        batch = batch.append_column("__row", pa.array(np.arange(len(batch), dtype=np.int64)))
        j = batch.join(self.links, keys="key", join_type="left outer")
        j = j.join(self.unit_links, keys="__unit_key", join_type="left outer")
        j = j.sort_by("__row")  # joins reorder; restore for determinism
        return emit_triples(j)


def emit_triples(j: pa.Table) -> pa.Table:
    """Vectorized emission per the module-docstring rules."""
    n = len(j)
    if n == 0:
        return TRIPLES.empty_table()
    kind = j.column("kind").to_pandas().to_numpy(dtype=object)
    has_uri = pc.is_valid(j.column("term_uri")).to_numpy(zero_copy_only=False)
    typed = kind != "none"

    subj = j.column("url")
    pred = j.column("char_type")
    parts: list[pa.Table] = []

    def build(mask: np.ndarray, obj, obj_kind, num, num_hi, dt, dt_hi, unit_uri,
              comparator, conf, score):
        idx = pa.array(np.flatnonzero(mask))
        t = pa.table(
            {
                "subj": subj.take(idx),
                "pred": pred.take(idx),
                "obj": obj.take(idx) if not isinstance(obj, pa.Table) else obj,
                "obj_kind": obj_kind.take(idx),
                "obj_num": num.take(idx),
                "obj_num_hi": num_hi.take(idx),
                "obj_dt": dt.take(idx),
                "obj_dt_hi": dt_hi.take(idx),
                "unit_uri": unit_uri.take(idx),
                "comparator": comparator.take(idx),
                "confidence": conf.take(idx),
                "score": score.take(idx),
            }
        )
        return t.cast(TRIPLES)

    null_s = pa.nulls(n, pa.string())
    null_f = pa.nulls(n, pa.float64())
    null_ts = pa.nulls(n, pa.timestamp("us"))
    null_f32 = pa.nulls(n, pa.float32())

    # 1. ontology-URI triples for linked keys
    if has_uri.any():
        parts.append(
            build(
                has_uri,
                j.column("term_uri"),
                pa.array(np.full(n, "uri"), pa.string()),
                null_f, null_f, null_ts, null_ts, null_s, null_s,
                j.column("confidence"),
                j.column("score").cast(pa.float32()) if j.column("score").type != pa.float32() else j.column("score"),
            )
        )

    # 2. typed-value triples for parsed values
    if typed.any():
        obj_lex = _lexical_forms(j, kind)
        num = j.column("num")
        num_lo = j.column("num_lo")
        num_hi = j.column("num_hi")
        is_rng = kind == "number_range"
        obj_num = pc.if_else(pa.array(is_rng), num_lo, num)
        obj_num_hi = pc.if_else(pa.array(is_rng), num_hi, pa.nulls(n, pa.float64()))
        is_drng = kind == "date_range"
        obj_dt = pc.if_else(pa.array(is_drng), j.column("dt_lo"), j.column("dt"))
        obj_dt_hi = pc.if_else(pa.array(is_drng), j.column("dt_hi"), pa.nulls(n, j.column("dt").type))
        parts.append(
            build(
                typed,
                obj_lex,
                pa.array(kind.astype(str), pa.string()),
                obj_num.cast(pa.float64()),
                obj_num_hi.cast(pa.float64()),
                obj_dt,
                obj_dt_hi,
                j.column("unit_uri"),
                # comparator note survives to the triple: '<5' must not
                # be asserted (or deduped) as the exact number 5
                j.column("note"),
                null_s, null_f32,
            )
        )

    # 3. plain string literals when neither linked nor parsed
    rest = ~has_uri & ~typed
    if rest.any():
        value_norm = pc.replace_substring_regex(
            j.column("key"), "^[^|]*\\|", ""
        )  # key = "type|value_norm"
        parts.append(
            build(
                rest, value_norm,
                pa.array(np.full(n, "string"), pa.string()),
                null_f, null_f, null_ts, null_ts, null_s, null_s, null_s, null_f32,
            )
        )

    if not parts:
        return TRIPLES.empty_table()
    return pa.concat_tables(parts)


def _lexical_forms(j: pa.Table, kind: np.ndarray) -> pa.Array:
    """Canonical obj string per typed kind (vectorized).

    Conversions run COMPACTED per kind: the pandas float→str pass (the
    canonical number form, pinned by goldens) was the single hottest
    line of the finalize task when run over the full mostly-null
    columns — each kind now converts only its own rows."""
    n = len(j)
    out = np.full(n, None, dtype=object)

    def fsub(col: str, idx: np.ndarray) -> np.ndarray:
        sub = j.column(col).take(pa.array(idx))
        return sub.to_pandas().astype(str).to_numpy(dtype=object)

    def dsub(col: str, idx: np.ndarray) -> np.ndarray:
        sub = j.column(col).take(pa.array(idx))
        return pc.strftime(sub, format="%Y-%m-%d").to_pandas().to_numpy(dtype=object)

    idx = np.flatnonzero(kind == "number")
    if len(idx):
        out[idx] = fsub("num", idx)
    idx = np.flatnonzero(kind == "number_range")
    if len(idx):
        out[idx] = pd.Series(fsub("num_lo", idx)).str.cat(
            pd.Series(fsub("num_hi", idx)), sep="-").to_numpy(dtype=object)
    idx = np.flatnonzero(kind == "date")
    if len(idx):
        out[idx] = dsub("dt", idx)
    idx = np.flatnonzero(kind == "date_range")
    if len(idx):
        out[idx] = pd.Series(dsub("dt_lo", idx)).str.cat(
            pd.Series(dsub("dt_hi", idx)), sep="/").to_numpy(dtype=object)
    return pa.array(out, pa.string())


def expand_ancestors(
    triples: "ray.data.Dataset",
    closure: pa.Table | None = None,
    include_original: bool = True,
) -> "ray.data.Dataset":
    """Materialized subsumption inference: for every ``obj_kind="uri"``
    triple whose object has ancestors in the is-a ``closure`` table
    (``state.dictionaries.ancestor_closure`` by default), emit the
    entailed ``(subj, pred, ancestor_uri)`` triples — the standard KG
    ancestor expansion ('Homo sapiens' pages also match 'Mammalia').

    Scale shape: the closure is ONTOLOGY-sized (broadcast once via
    ``ray.put``, fetched zero-copy per worker); expansion is a
    row-expanding vectorized map over the triple stream — index_in
    against the child list, flat-take row/ancestor indices, no per-row
    Python. Entailed rows inherit confidence/score and keep
    ``obj_kind="uri"``; duplicates (two children sharing an ancestor)
    are left to the caller's exact dedup. ``unit_uri`` sidecars are NOT
    expanded (units subsume trivially; entailed unit triples add noise).
    """
    state_ref = ray.put(closure_csr(
        closure if closure is not None else _default_closure()))

    def expand(batch: pa.Table) -> pa.Table:
        return expand_ancestors_table(batch, ray.get(state_ref),
                                      include_original=include_original)

    return triples.map_batches(expand, batch_format="pyarrow")


def closure_csr(closure: pa.Table):
    """(uri, anc_uri) closure table → (children, CSR offsets, flat
    ancestor array) — the broadcastable expansion state."""
    df = closure.to_pandas().sort_values(["uri", "anc_uri"])
    children = df["uri"].drop_duplicates().to_numpy(dtype=object)
    counts = df.groupby("uri", sort=True).size().to_numpy()
    offs = np.concatenate(([0], np.cumsum(counts)))
    return (pa.array(children, pa.string()), offs,
            pa.array(df["anc_uri"].to_numpy(dtype=object), pa.string()))


def expand_ancestors_table(batch: pa.Table, csr,
                           include_original: bool = True) -> pa.Table:
    """Table-level expansion kernel (shared by the Dataset operator and
    the checkpointed sink's partition finalize)."""
    kids, offsets, flat_anc = csr
    idx = pc.index_in(batch.column("obj"), value_set=kids)
    valid = pc.and_kleene(pc.is_valid(idx),
                          pc.equal(batch.column("obj_kind"), "uri"))
    sel = np.flatnonzero(valid.to_numpy(zero_copy_only=False))
    if len(sel) == 0:
        return batch if include_original else batch.schema.empty_table()
    ix = idx.to_numpy(zero_copy_only=False)[sel].astype(np.int64)
    cnt = offsets[ix + 1] - offsets[ix]
    row_take = np.repeat(sel, cnt)
    starts = np.repeat(offsets[ix], cnt)
    within = np.arange(len(row_take)) - np.repeat(
        np.cumsum(cnt) - cnt, cnt)
    anc_vals = flat_anc.take(pa.array(starts + within))
    exp = batch.take(pa.array(row_take))
    exp = exp.set_column(exp.schema.get_field_index("obj"),
                         "obj", anc_vals)
    return pa.concat_tables([batch, exp]) if include_original else exp


def _default_closure() -> pa.Table:
    from ..state.dictionaries import ancestor_closure

    return ancestor_closure()
