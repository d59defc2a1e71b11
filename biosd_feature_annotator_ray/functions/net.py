"""IPv4 / CIDR kernels — the network-range side of web-log curation
(bot-range filtering, datacenter-IP exclusion, per-AS aggregation).
Pure Arrow/numpy; malformed inputs become nulls, never exceptions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
_CIDR_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}/\d{1,2}$"


def _flat(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def ipv4_to_uint32(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Dotted-quad IPv4 strings → int64 values in [0, 2^32) (int64 so
    downstream Arrow arithmetic never wraps); malformed strings and
    octets > 255 → null."""
    arr = _flat(arr)
    if arr.type != pa.string():
        arr = arr.cast(pa.string())
    shape_ok = pc.fill_null(
        pc.match_substring_regex(arr, _IP_RE), False)
    safe = pc.if_else(shape_ok, arr, pa.scalar("0.0.0.0"))
    parts = pc.split_pattern(safe, ".")
    vals = np.zeros(len(arr), dtype=np.int64)
    octet_ok = np.ones(len(arr), dtype=bool)
    for i in range(4):
        o = pc.list_element(parts, i).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        octet_ok &= o <= 255
        vals = vals * 256 + o
    ok = shape_ok.to_numpy(zero_copy_only=False) & octet_ok
    return pc.if_else(pa.array(ok), pa.array(vals, pa.int64()),
                      pa.nulls(len(arr), pa.int64()))


def cidr_to_range(arr: "pa.Array | pa.ChunkedArray") -> pa.Table:
    """CIDR strings (``a.b.c.d/p``) → ``(cidr, lo, hi)`` int64 range
    bounds; malformed strings or prefix > 32 → null bounds. The base
    address is masked down to the network boundary (``10.0.0.7/8`` →
    ``10.0.0.0``–``10.255.255.255``)."""
    arr = _flat(arr)
    if arr.type != pa.string():
        arr = arr.cast(pa.string())
    shape_ok = pc.fill_null(
        pc.match_substring_regex(arr, _CIDR_RE), False)
    safe = pc.if_else(shape_ok, arr, pa.scalar("0.0.0.0/0"))
    halves = pc.split_pattern(safe, "/")
    base = ipv4_to_uint32(pc.list_element(halves, 0))
    pfx = pc.list_element(halves, 1).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    ok = (shape_ok.to_numpy(zero_copy_only=False)
          & pc.is_valid(base).to_numpy(zero_copy_only=False)
          & (pfx <= 32))
    b = pc.fill_null(base, 0).to_numpy(zero_copy_only=False)
    size = np.int64(1) << (32 - np.minimum(pfx, 32))
    lo = (b // size) * size
    hi = lo + size - 1
    return pa.table({
        "cidr": arr,
        "lo": pc.if_else(pa.array(ok), pa.array(lo, pa.int64()),
                         pa.nulls(len(arr), pa.int64())),
        "hi": pc.if_else(pa.array(ok), pa.array(hi, pa.int64()),
                         pa.nulls(len(arr), pa.int64()))})


def ip_in_cidr_join(
    ips: "ray.data.Dataset",
    cidrs: "list[str]",
    ip_col: str = "ip",
    how: str = "inner",
) -> "ray.data.Dataset":
    """Tag every row whose ``ip_col`` falls inside any of ``cidrs``
    (the bot/datacenter-range filter): broadcast the parsed range
    table — a blocklist is the SMALL side by definition — and do a
    vectorized ``searchsorted`` containment probe per batch; no
    shuffle at all. Overlapping CIDRs: the FIRST match in ``cidrs``
    order wins. ``how``: ``inner`` keeps matching rows only,
    ``left`` keeps all rows with a null ``cidr`` on misses,
    ``anti`` keeps non-matching rows (the filter mode; the ``cidr``
    column is present and all-null so the schema is mode-stable).

    Returns the input plus ``cidr``.
    """
    import ray as _ray

    if how not in ("inner", "left", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    rng = cidr_to_range(pa.array(list(cidrs), pa.string()))
    if rng.num_rows and pc.any(
            pc.is_null(rng.column("lo"))).as_py():
        bad = rng.filter(pc.is_null(rng.column("lo")))
        raise ValueError(
            f"malformed CIDRs: {bad.column('cidr').to_pylist()}")
    rng_ref = _ray.put({
        "lo": rng.column("lo").to_numpy(zero_copy_only=False),
        "hi": rng.column("hi").to_numpy(zero_copy_only=False),
        "cidr": rng.column("cidr").to_pylist()})

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _r

        r = _r.get(rng_ref)
        ip = ipv4_to_uint32(batch.column(ip_col))
        ipn = pc.fill_null(ip, -1).to_numpy(zero_copy_only=False)
        match = np.full(len(ipn), -1, np.int64)
        # first match in cidrs order wins: probe in reverse so
        # earlier entries overwrite later ones
        for i in range(len(r["lo"]) - 1, -1, -1):
            inside = (ipn >= r["lo"][i]) & (ipn <= r["hi"][i])
            match[inside] = i
        hit = match >= 0
        tag = pa.array(
            [r["cidr"][m] if m >= 0 else None for m in match],
            pa.string())
        out = batch.append_column("cidr", tag)
        if how == "inner":
            return out.filter(pa.array(hit))
        if how == "anti":
            return out.filter(pa.array(~hit))  # cidr stays, all null
        return out

    return ips.map_batches(probe, batch_format="pyarrow",
                           batch_size=65536)
