"""N-Triples sink + source (graft-added, r04).

The KG-native line format: one ``<subj> <pred> obj .`` statement per
line, UTF-8, where obj is an IRI, a blank node, or an escaped string
literal. This is the interchange surface a knowledge-graph pipeline
ships to triple stores / public dumps, complementing the Parquet
sink (which stays the internal columnar format).

Scale shape: each ``map_batches`` task serializes its own blocks and
writes ONE ``.nt`` file named by its content hash —
embarrassingly parallel, no driver fan-in, and idempotent (a re-run
of the same block rewrites the same bytes to the same name, so a
crashed job can simply be re-run). Reading uses
``ray.data.read_text`` + one vectorized RE2 parse per batch; the
rare literal containing a backslash takes a per-row unescape scan
(correct ``\\\\``-before-``\\n`` handling cannot be a chained
replace).

Term typing on write: an ``obj_kind_col`` (e.g. the triples table's
``obj_kind``) marks ``uri`` rows as IRIs; without it, objects with a
``scheme://`` shape or a ``_:`` prefix serialize as IRI / blank node
and everything else as a literal.
"""

from __future__ import annotations

import hashlib
import os
import re
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESC = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}
_IRI_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

_LINE_RE = (r"^(?P<s><[^>]*>|_:\S+)\s+<(?P<p>[^>]*)>\s+"
            r"(?P<o><[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\")\s*\.\s*$")


def _escape_literals(arr: pa.Array) -> pa.Array:
    out = arr
    for ch, rep in _ESC.items():
        out = pc.replace_substring(out, ch, rep)
    return out


def _unescape(s: str) -> str:
    buf = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            buf.append(_UNESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            buf.append(c)
            i += 1
    return "".join(buf)


def _term(arr: pa.Array, kinds: "pa.Array | None") -> pa.Array:
    """Serialize an object column: IRI / blank node / escaped literal.
    When a kinds column is given it is AUTHORITATIVE: 'uri' → IRI,
    'bnode' → bare blank node, anything else (incl. a literal that
    happens to start with '_:') → escaped literal. Only without kinds
    do the scheme:// and '_:' shape heuristics decide."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if kinds is not None:
        is_iri = pc.equal(kinds, "uri")
        is_bnode = pc.equal(kinds, "bnode")
    else:
        is_iri = pc.match_substring_regex(arr, _IRI_RE)
        is_bnode = pc.starts_with(arr, "_:")
    lit = pc.binary_join_element_wise(
        pa.scalar('"'), _escape_literals(arr), pa.scalar('"'), "")
    iri = pc.binary_join_element_wise(
        pa.scalar("<"), arr, pa.scalar(">"), "")
    out = pc.if_else(pc.fill_null(is_iri, False), iri, lit)
    return pc.if_else(pc.fill_null(is_bnode, False), arr, out)


def serialize_ntriples(batch: pa.Table, subj_col: str = "subj",
                       pred_col: str = "pred", obj_col: str = "obj",
                       obj_kind_col: str | None = None) -> pa.Array:
    """One N-Triples line per row (no trailing newline)."""
    subj = batch.column(subj_col)
    if isinstance(subj, pa.ChunkedArray):
        subj = subj.combine_chunks()
    s = pc.if_else(
        pc.starts_with(subj, "_:"), subj,
        pc.binary_join_element_wise(pa.scalar("<"), subj,
                                    pa.scalar(">"), ""))
    kinds = None
    if obj_kind_col is not None:
        kinds = batch.column(obj_kind_col)
        if isinstance(kinds, pa.ChunkedArray):
            kinds = kinds.combine_chunks()
    o = _term(batch.column(obj_col), kinds)
    pred = batch.column(pred_col)
    if isinstance(pred, pa.ChunkedArray):
        pred = pred.combine_chunks()
    return pc.binary_join_element_wise(
        s, pa.scalar(" <"), pred, pa.scalar("> "), o, pa.scalar(" ."), "")


def write_ntriples(ds: "ray.data.Dataset", path: str,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj",
                   obj_kind_col: str | None = None) -> pa.Table:
    """Write a triple Dataset as content-hash-named ``.nt`` files
    under ``path`` (one file per block). Re-runs are idempotent ONLY
    while block boundaries are unchanged (same input files + same
    parallelism): a re-run with different boundaries produces
    different content hashes and leaves the old parts in place —
    export into a fresh directory when re-partitioning. Returns the
    small (path, n_triples) manifest table."""
    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_triples": pa.array([], pa.int64())})
        lines = serialize_ntriples(batch, subj_col, pred_col, obj_col,
                                   obj_kind_col)
        payload = ("\n".join(lines.to_pylist()) + "\n").encode()
        name = f"part-{hashlib.md5(payload).hexdigest()[:16]}.nt"
        fp = os.path.join(path, name)
        # unique tmp per attempt: two concurrent tasks with byte-
        # identical blocks must not share (and race on) one tmp file
        tmp = f"{fp}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, fp)
        return pa.table({"path": pa.array([fp], pa.string()),
                         "n_triples": pa.array([len(batch)], pa.int64())})

    return (ds.map_batches(write_block, batch_format="pyarrow")
            .to_pandas().pipe(pa.Table.from_pandas, preserve_index=False))


def parse_ntriples(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized N-Triples line parse → ``(subj, pred, obj,
    obj_kind)`` with ``obj_kind`` ∈ {uri, bnode, string}; blank and
    comment lines are dropped; malformed lines raise (a dump with
    syntax errors should fail loudly, not silently shrink)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    keep = pc.invert(pc.match_substring_regex(text, r"^\s*(#|$)"))
    text = text.filter(pc.fill_null(keep, False))
    ex = pc.extract_regex(text, _LINE_RE)
    if ex.null_count:
        bad = text.filter(pc.is_null(ex)).slice(0, 3).to_pylist()
        raise ValueError(f"malformed N-Triples line(s): {bad!r}")
    s = pc.struct_field(ex, "s")
    p = pc.struct_field(ex, "p")
    o = pc.struct_field(ex, "o")
    s = pc.if_else(pc.starts_with(s, "_:"), s,
                   pc.replace_substring_regex(s, r"^<|>$", ""))
    is_iri = pc.starts_with(o, "<").to_numpy(zero_copy_only=False)
    is_bnode = pc.starts_with(o, "_:").to_numpy(zero_copy_only=False)
    ostr = o.to_pylist()
    objs = []
    for i, v in enumerate(ostr):
        if is_iri[i]:
            objs.append(v[1:-1])
        elif is_bnode[i]:
            objs.append(v)
        else:
            body = v[1:-1]
            objs.append(_unescape(body) if "\\" in body else body)
    kind = np.where(is_iri, "uri", np.where(is_bnode, "bnode", "string"))
    return pa.table({
        "subj": s, "pred": p,
        "obj": pa.array(objs, pa.string()),
        "obj_kind": pa.array(kind.tolist(), pa.string()),
    })


def read_ntriples(path: str) -> "ray.data.Dataset":
    """Read a ``.nt`` directory (or file) back into a triple Dataset."""
    import ray.data as rd

    ds = rd.read_text(path, file_extensions=["nt"])
    return ds.map_batches(parse_ntriples, batch_format="pyarrow",
                          batch_size=65536)
