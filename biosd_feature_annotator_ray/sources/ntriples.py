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


# ---------------------------------------------------------------------------
# Turtle (prefix-compressed) sink + source — the human-facing KG
# interchange sibling of the .nt sink above. Same scale shape:
# content-hash-named blocks, embarrassingly parallel, idempotent.
#
# Serialization contract (kept deliberately line-oriented so the
# reader stays stateless across blocks): every SUBJECT GROUP is ONE
# line — `s p1 o1 ; p2 o2 .` — grouping is batch-local (Turtle allows
# repeated subjects across groups), and IRIs compress to pfx:local
# against the caller's prefix map (longest namespace wins) only when
# the local part is PN-safe; otherwise they stay <bracketed>. The
# reader takes the SAME prefix map (this is a reader for this sink's
# output, not a general Turtle parser — @prefix header lines are
# validated and skipped).

_PN_LOCAL_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")
_TURTLE_TERM_RE = re.compile(
    r"<[^>]*>|\"(?:[^\"\\]|\\.)*\"|[A-Za-z][A-Za-z0-9_\-]*:[A-Za-z0-9_\-]*"
    r"|_:\S+|;|\.")


def _pfx_compress(iri: str, prefixes: "dict[str, str]") -> str:
    best = None
    for pfx, ns in prefixes.items():
        if iri.startswith(ns) and (best is None
                                   or len(ns) > len(prefixes[best])):
            local = iri[len(ns):]
            if _PN_LOCAL_RE.match(local):
                best = pfx
    if best is None:
        return f"<{iri}>"
    return f"{best}:{iri[len(prefixes[best]):]}"


def serialize_turtle(batch: pa.Table, prefixes: "dict[str, str]",
                     subj_col: str = "subj", pred_col: str = "pred",
                     obj_col: str = "obj",
                     obj_kind_col: str | None = None) -> list[str]:
    """One Turtle line per batch-local subject group (see module
    contract above). Literal escaping is shared with the .nt sink."""
    df_cols = [subj_col, pred_col, obj_col]
    if obj_kind_col:
        df_cols.append(obj_kind_col)
    df = batch.select(df_cols).to_pandas()
    df = df.sort_values([subj_col, pred_col, obj_col], kind="stable")
    lines: list[str] = []
    esc = str.maketrans({"\\": "\\\\", '"': '\\"', "\n": "\\n",
                         "\r": "\\r", "\t": "\\t"})

    def term(o: str, kind: "str | None") -> str:
        if kind is not None:
            is_iri = kind == "uri"
            is_bn = kind == "bnode"
        else:
            is_iri = bool(re.match(_IRI_RE, o))
            is_bn = o.startswith("_:")
        if is_bn:
            return o
        if is_iri:
            return _pfx_compress(o, prefixes)
        return '"' + o.translate(esc) + '"'

    for subj, grp in df.groupby(subj_col, sort=True):
        s = subj if str(subj).startswith("_:") else \
            _pfx_compress(str(subj), prefixes)
        parts = []
        for r in grp.itertuples(index=False):
            p = _pfx_compress(getattr(r, pred_col), prefixes)
            k = getattr(r, obj_kind_col) if obj_kind_col else None
            parts.append(f"{p} {term(getattr(r, obj_col), k)}")
        lines.append(f"{s} " + " ; ".join(parts) + " .")
    return lines


def write_turtle(ds: "ray.data.Dataset", path: str,
                 prefixes: "dict[str, str]",
                 subj_col: str = "subj", pred_col: str = "pred",
                 obj_col: str = "obj",
                 obj_kind_col: str | None = None) -> pa.Table:
    """Write a triple Dataset as content-hash-named ``.ttl`` blocks
    (each with its own @prefix header). Same idempotence contract as
    :func:`write_ntriples`."""
    os.makedirs(path, exist_ok=True)
    header = "".join(f"@prefix {p}: <{ns}> .\n"
                     for p, ns in sorted(prefixes.items()))

    def write_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_triples": pa.array([], pa.int64())})
        lines = serialize_turtle(batch, prefixes, subj_col, pred_col,
                                 obj_col, obj_kind_col)
        payload = (header + "\n".join(lines) + "\n").encode()
        name = f"part-{hashlib.md5(payload).hexdigest()[:16]}.ttl"
        fp = os.path.join(path, name)
        tmp = f"{fp}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, fp)
        return pa.table({"path": pa.array([fp], pa.string()),
                         "n_triples": pa.array([len(batch)], pa.int64())})

    return (ds.map_batches(write_block, batch_format="pyarrow")
            .to_pandas().pipe(pa.Table.from_pandas, preserve_index=False))


def parse_turtle(batch: pa.Table, prefixes: "dict[str, str]",
                 text_col: str = "text") -> pa.Table:
    """Parse lines of this sink's Turtle output back to (subj, pred,
    obj) rows. @prefix lines must re-declare a known mapping (raises
    on an unknown prefix — the reader's map IS the file's map);
    malformed statement lines raise rather than silently drop."""
    out_s: list = []
    out_p: list = []
    out_o: list = []

    def expand(t: str) -> str:
        if t.startswith("<"):
            return t[1:-1]
        if t.startswith("_:"):
            return t
        pfx, local = t.split(":", 1)
        if pfx not in prefixes:
            raise ValueError(f"unknown prefix {pfx!r}")
        return prefixes[pfx] + local

    for line in batch.column(text_col).to_pylist():
        if line is None:
            continue
        ln = line.strip()
        if not ln:
            continue
        if ln.startswith("@prefix"):
            m = re.match(r"@prefix\s+([A-Za-z][\w\-]*):\s+<([^>]*)>\s*\.",
                         ln)
            if not m or prefixes.get(m.group(1)) != m.group(2):
                raise ValueError(f"prefix mismatch in header: {ln!r}")
            continue
        toks = _TURTLE_TERM_RE.findall(ln)
        if len(toks) < 4 or toks[-1] != ".":
            raise ValueError(f"malformed turtle line: {ln!r}")
        subj = expand(toks[0])
        i = 1
        while i < len(toks) - 1:
            p, o = toks[i], toks[i + 1]
            out_s.append(subj)
            out_p.append(expand(p))
            if o.startswith('"'):
                out_o.append(_unescape(o[1:-1]))
            else:
                out_o.append(expand(o))
            i += 2
            if i < len(toks) - 1 and toks[i] == ";":
                i += 1
    return pa.table({"subj": pa.array(out_s, pa.string()),
                     "pred": pa.array(out_p, pa.string()),
                     "obj": pa.array(out_o, pa.string())})


def read_turtle(path: str, prefixes: "dict[str, str]"):
    """Read a directory of this sink's ``.ttl`` blocks back as a
    triple Dataset."""
    import ray.data as rd

    ds = rd.read_text(path, file_extensions=["ttl"])
    return ds.map_batches(
        lambda b: parse_turtle(b, prefixes), batch_format="pyarrow",
        batch_size=65536)
