#!/usr/bin/env python3
"""Prototype CoreArray GDS reader (public gdsfmt container format,
recovered from fixture bytes) — the blueprint for the Scala DSv2 source.

Layers:
  1. Block layer: file = magic(12) + version(2) + entryId(4) + blocks.
     Block = [size:u48][next:u48][id:u32][content]; bit47 of size marks
     the head fragment; sizes include the 16-byte header; `next` chains
     fragments of one stream.
  2. Node records: CdSerial property lists matched by token; class names
     are 7-bit-packed ASCII; folders embed child tables (name->stream).
  3. Data streams: referenced by id; "*_ra" coders frame the payload as
     [magic "XZ_RA"/"LZMA_RA"/"ZRA"][u8 version?][u8 blockSizeLog]
     [u32-ish ...] then independently compressed chunks; we locate the
     standard xz/lzma/zlib magic and stream-decode.
"""
import struct, sys, lzma, zlib

def u16(b, o): return struct.unpack_from("<H", b, o)[0]
def u32(b, o): return struct.unpack_from("<I", b, o)[0]
def u64(b, o): return struct.unpack_from("<Q", b, o)[0]
def u48(b, o):
    lo, hi = struct.unpack_from("<IH", b, o)
    return lo | (hi << 32)

def unpack7(b, n):
    bits = acc = i = 0
    out = []
    for _ in range(n):
        while bits < 7:
            acc |= b[i] << bits; bits += 8; i += 1
        out.append(acc & 0x7f); acc >>= 7; bits -= 7
    return bytes(out).decode()

def streams(data):
    assert data[:12] == b"COREARRAYx0A"
    pos, frags = 18, []
    while pos + 16 <= len(data):
        size = u48(data, pos)
        head = bool(size >> 47)
        size &= (1 << 47) - 1
        frags.append(dict(pos=pos, size=size, next=u48(data, pos + 6),
                          id=u32(data, pos + 12), head=head))
        pos += size
    by_pos = {f["pos"]: f for f in frags}
    out = {}
    for f in frags:
        if not f["head"]:
            continue
        buf, cur = bytearray(), f
        while True:
            buf += data[cur["pos"] + 16: cur["pos"] + cur["size"]]
            if cur["next"] == 0:
                break
            cur = by_pos[cur["next"]]
        out[f["id"]] = bytes(buf)
    return out

def folder_children(rec):
    kids, i = [], 0
    while i + 6 < len(rec):
        if rec[i:i+6] == bytes.fromhex("03000902f500"):
            start = i - 6
            elen = u48(rec, start)
            cid = u32(rec, i + 6)
            j = i + 10
            name, flags = None, 0
            if rec[j:j+5] == bytes.fromhex("0944743112"):
                flags = u32(rec, j + 5)
                j += 9
            if rec[j] in (0x15, 0x16, 0x17) \
                    and rec[j+1:j+5] == bytes.fromhex("44c66010"):
                nl = rec[j+5]
                name = rec[j+6:j+6+nl].decode("utf-8", "replace")
            kids.append(dict(id=cid, name=name, flags=flags))
            i = start + max(elen, 1)
        else:
            i += 1
    return kids

SIGS = [  # (hexsig, handler key)
    ("0001", "cls"), ("15c4466d10", "coder"),
    ("138616451ef401", "offset"), ("1385e7301704", "scale"),
    ("02c9466d50e051250410", "sizes"), ("05ca466d507041217401", "skip10"),
    ("0205cb466d50d0581e5542", "skip12"), ("07c4e3641f", "ndim"),
    ("02c34361", "dims"), ("09c4c37c0c", "data_id"),
    ("0807f37d9d937d", "nattr"), ("0108f37ddd45791f", "attrs"),
    ("08c643754ef601", "nchild"), ("01c7437517e57d", "children"),
]

def parse_record(rec):
    r = dict(cls=None, coder=None, ndim=None, dims=None, data_id=None,
             raw=None, cmp=None, nattr=0, attrs=b"", nchild=0, children=[],
             unknown=None)
    p = 14  # [u48 len][u48 len2][u16 nprops]
    while p < len(rec):
        hit = None
        for sig, key in SIGS:
            s = bytes.fromhex(sig)
            if rec[p:p+len(s)] == s:
                hit = (key, len(s)); break
        if hit is None:
            # value-length quirks leave us a few bytes off; resync by
            # scanning forward for the next recognizable token
            q = p + 1
            found = False
            while q < len(rec) and q < p + 64:
                for sig, _ in SIGS:
                    s = bytes.fromhex(sig)
                    if len(s) >= 5 and rec[q:q+len(s)] == s:
                        found = True; break
                if found:
                    break
                q += 1
            if not found:
                break
            p = q
            continue
        key, sl = hit
        if key == "offset":
            r["offset"] = struct.unpack_from("<d", rec, p + 7)[0]; p += 15
            continue
        if key == "scale":
            r["scale"] = struct.unpack_from("<d", rec, p + 6)[0]; p += 14
            continue
        if key == "cls":
            n = rec[p+2]; need = (n*7+7)//8
            r["cls"] = unpack7(rec[p+3:p+3+need], n); p += 3+need
        elif key == "coder":
            n = rec[p+5]; r["coder"] = rec[p+6:p+6+n].decode(); p += 6+n
        elif key == "sizes":
            r["raw"], r["cmp"] = u64(rec, p+10), u64(rec, p+18); p += 26
        elif key == "skip10": p += 10
        elif key == "skip12": p += 12
        elif key == "ndim": r["ndim"] = u16(rec, p+5); p += 7
        elif key == "dims":
            nb = rec[p+4]
            r["dims"] = [u32(rec, p+5+4*i) for i in range(nb // 4)]
            p += 5 + nb
        elif key == "data_id": r["data_id"] = u32(rec, p+5); p += 9
        elif key == "nattr": r["nattr"] = u32(rec, p+7); p += 11
        elif key == "attrs":
            n = u48(rec, p+8); r["attrs"] = rec[p+14:p+14+n]; p += 14+n
        elif key == "nchild": r["nchild"] = u32(rec, p+7); p += 11
        elif key == "children":
            n = u48(rec, p+7)
            r["children"] = folder_children(rec[p+13:p+13+n])
            # the blob length is a few bytes off in practice; step back
            # before the resync scan so the next token isn't overshot
            p += 13 + n - 8
    return r

def walk(st, sid=1, name="<root>", depth=0, out=None):
    r = parse_record(st[sid])
    if out is not None:
        out.append((name, sid, r))
    yield name, sid, r, depth
    for k in r["children"]:
        yield from walk(st, k["id"], f"{name}/{k['name']}", depth + 1, out)

def main(path):
    data = open(path, "rb").read()
    st = streams(data)
    for name, sid, r, depth in walk(st):
        desc = {k: v for k, v in r.items()
                if v and k not in ("children", "attrs")}
        data_len = len(st.get(r["data_id"], b"")) if r["data_id"] else 0
        print("  " * depth + f"{name.split('/')[-1]} [sid={sid}"
              + (f" data={r['data_id']}({data_len}B)" if r["data_id"] else "")
              + f"] {desc}")


# ---- *_ra stream decode + oracle dumps --------------------------------------
# Chunk framing (same empirical recovery as the tree layer): stream =
# [u48 total][magic "XZ_RA"/"ZIP_RA"/"LZ4_RA"][verHi verLo][0xff]
# [u32 nChunks] then per chunk v11: [u48 cmpSize][payload] /
# v10: [u24 cmpSizeIncl][u32 rawSize][payload]; each payload is one
# independent xz / zlib stream.

def ra_decode(stream):
    magics = {b"XZ_RA": "xz", b"ZIP_RA": "zlib"}
    for m, kind in magics.items():
        if stream[6:6 + len(m)] == m:
            mlen = len(m)
            break
    else:
        return stream[6:]  # uncompressed payload
    v11 = stream[6 + mlen + 1] >= 0x11
    n = u32(stream, 6 + mlen + 3)
    p = 6 + mlen + 7
    out = bytearray()
    for _ in range(n):
        if v11:
            size, off = u48(stream, p), p + 6
        else:
            size = (stream[p] | (stream[p+1] << 8) | (stream[p+2] << 16)) - 7
            off = p + 7
        payload = bytes(stream[off:off + size])
        if kind == "xz":
            out += lzma.decompress(payload)
        else:
            out += zlib.decompress(payload)
        p = off + size
    return bytes(out)


def node_bytes(st, path_names):
    """Decoded raw bytes of the node at path (list of child names)."""
    recs = {name: (sid, r) for name, sid, r, _ in walk(st)}
    key = "<root>/" + "/".join(path_names)
    sid, r = recs[key]
    return ra_decode(st[r["data_id"]]), r


def dump_1kg_stats(path, out_parquet):
    """Per-variant REF-dosage stats of a diploid single-plane GDS,
    computed INDEPENDENTLY of the Scala engine (this decoder shares no
    code with it) — the DuckDB oracle for the q60 packed-AF aggregate.
    Semantics match the packed lane: a call with any missing allele
    (2-bit code 3) folds to fully missing; `called` counts ALLELES
    (2 per fully-called sample); `ac_ref` counts REF (allele 0) among
    fully-called samples."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    geno, gr = node_bytes(st, ["genotype", "data"])
    planes, _ = node_bytes(st, ["genotype", "@data"])
    vid_raw, vr = node_bytes(st, ["variant.id"])
    n_planes, n_samp, ploidy = gr["dims"]
    n_var = vr["dims"][0]
    assert ploidy == 2, f"ploidy {ploidy}"
    assert set(planes[:n_var]) == {1}, "multi-plane variant present"
    assert n_planes == n_var and len(geno) == n_var * n_samp * 2 // 4
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    arr = np.frombuffer(geno, np.uint8).reshape(n_var, n_samp * 2 // 4)
    # byte = 4 allele slots (2 bits, LSB-first): slots (0,1)=sample 2k,
    # (2,3)=sample 2k+1
    a0, a1 = arr & 3, (arr >> 2) & 3
    b0, b1 = (arr >> 4) & 3, (arr >> 6) & 3
    def lane(x, y):
        ok = (x != 3) & (y != 3)
        refs = np.where(ok, (x == 0).astype(np.int64)
                        + (y == 0).astype(np.int64), 0)
        return ok.sum(axis=1, dtype=np.int64), refs.sum(axis=1)
    c_a, r_a = lane(a0, a1)
    c_b, r_b = lane(b0, b1)
    called = 2 * (c_a + c_b)
    ac_ref = r_a + r_b
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, called BIGINT, "
                "ac_ref BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(int(v), int(c), int(a))
                     for v, c, a in zip(vids, called, ac_ref)])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n_var} variants, sum_called={called.sum()}, "
          f"sum_ref={ac_ref.sum()}")


def dump_1kg_dosage(path, out_parquet, cut):
    """Per-sample REF-dosage vectors (NULL = any-missing call) plus
    positions for the first `cut` variants (storage order == variant.id
    order in this fixture) — the DuckDB oracle input for replaying the
    banded windowed-LD join on the 1KG fixture. Same independent decode
    as dump_1kg_stats; per-pair LD statistics are Σ over samples, so
    they are invariant to sample order as long as the vector order is
    consistent across variants (it is: storage order)."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    geno, gr = node_bytes(st, ["genotype", "data"])
    planes, _ = node_bytes(st, ["genotype", "@data"])
    vid_raw, vr = node_bytes(st, ["variant.id"])
    pos_raw, _ = node_bytes(st, ["position"])
    n_planes, n_samp, ploidy = gr["dims"]
    n_var = vr["dims"][0]
    assert ploidy == 2, f"ploidy {ploidy}"
    # a multi-plane (multiallelic-overflow) variant would silently
    # misalign the reshape below — fail loudly like dump_1kg_stats
    assert set(planes[:n_var]) == {1}, "multi-plane variant present"
    assert n_planes == n_var and len(geno) == n_var * n_samp * 2 // 4
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    poss = np.frombuffer(pos_raw, "<i4", count=n_var)
    arr = np.frombuffer(geno, np.uint8).reshape(n_var, n_samp * 2 // 4)
    a0, a1 = arr & 3, (arr >> 2) & 3          # sample 2k alleles
    b0, b1 = (arr >> 4) & 3, (arr >> 6) & 3   # sample 2k+1 alleles
    def dos(x, y):
        ok = (x != 3) & (y != 3)
        return ok, (x == 0).astype(np.int64) + (y == 0).astype(np.int64)
    okA, dA = dos(a0, a1)
    okB, dB = dos(b0, b1)
    rows = []
    for v in range(cut):
        d = []
        for k in range(arr.shape[1]):
            d.append(int(dA[v, k]) if okA[v, k] else None)
            d.append(int(dB[v, k]) if okB[v, k] else None)
        rows.append((int(vids[v]), int(poss[v]), d[:n_samp]))
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, pos BIGINT, "
                "d BIGINT[])")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {cut} variants, {n_samp} samples")


def dump_imputed_ds(path, out_parquet):
    """Per-variant exact dosage-code sums of a dPackedReal8U DS matrix
    (the Imputed_dosages fixture): raw uint8 codes (255 = missing)
    summed as integers, BEFORE any scale multiplication — so the oracle
    compare against the engine's float surface stays exact (the engine
    side recovers codes via round(ds·127))."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    ds, dr = node_bytes(st, ["annotation", "format", "DS", "data"])
    vid_raw, vr = node_bytes(st, ["variant.id"])
    n_var, n_samp = dr["dims"]
    assert len(ds) == n_var * n_samp, (len(ds), dr["dims"])
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    arr = np.frombuffer(ds, np.uint8).reshape(n_var, n_samp)
    ok = arr != 255
    sums = np.where(ok, arr, 0).sum(axis=1, dtype=np.int64)
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, n_nonmiss BIGINT, "
                "sum_code BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(int(v), int(n), int(sc)) for v, n, sc in
                     zip(vids, ok.sum(axis=1), sums)])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n_var} variants x {n_samp} samples")


def dump_alleles(path, out_parquet):
    """Per-variant allele string ("REF,ALT,...") of a SEQ GDS, decoded
    independently of the Scala engine (dStr8 = LEB128-length-prefixed
    strings under the node's RA compression) — joined with
    the stats dump for allele-aware oracles (Ts/Tv by MAF bin)."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    ab, _ = node_bytes(st, ["allele"])
    vid_raw, vr = node_bytes(st, ["variant.id"])
    n_var = vr["dims"][0]
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    # dStr8 elements are LEB128 length + payload
    alleles = []
    p = 0
    for _ in range(n_var):
        l, s = 0, 0
        while True:
            v = ab[p]; p += 1
            l |= (v & 0x7F) << s; s += 7
            if not (v & 0x80):
                break
        alleles.append(ab[p:p + l].decode("utf-8"))
        p += l
    assert len(alleles) == n_var
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, allele VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(int(v), a) for v, a in zip(vids, alleles)])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n_var} variants")


def _leb_strings(b, n):
    out, p = [], 0
    for _ in range(n):
        l, s = 0, 0
        while True:
            v = b[p]; p += 1
            l |= (v & 0x7F) << s; s += 7
            if not (v & 0x80):
                break
        out.append(b[p:p + l].decode("utf-8"))
        p += l
    return out


def dump_families(path, out_parquet):
    """Per-sample (ordinal, sample_id, family) of a SEQ GDS — the
    independent twin of the engine's samples side table, for
    family-aware oracles."""
    data = open(path, "rb").read()
    st = streams(data)
    sid_b, sr = node_bytes(st, ["sample.id"])
    fam_b, _ = node_bytes(st, ["sample.annotation", "family"])
    n = sr["dims"][0]
    sids = _leb_strings(sid_b, n)
    fams = _leb_strings(fam_b, n)
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ordinal BIGINT, sample_id VARCHAR, "
                "family VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, s, f) for i, (s, f) in
                     enumerate(zip(sids, fams))])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n} samples")


def dump_code_counts(path, out_parquet):
    """Per-variant genotype-CLASS counts (REF-dosage convention: n_dos0 =
    hom-ALT, n_het, n_dos2 = hom-REF; any-missing call counts in none) of
    a diploid single-plane GDS, computed INDEPENDENTLY of the Scala
    engine — the DuckDB oracle for the packed-lane `code_count_packed`
    kernel (FIS/genotype-class queries)."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    geno, gr = node_bytes(st, ["genotype", "data"])
    planes, _ = node_bytes(st, ["genotype", "@data"])
    vid_raw, vr = node_bytes(st, ["variant.id"])
    n_planes, n_samp, ploidy = gr["dims"]
    n_var = vr["dims"][0]
    assert ploidy == 2 and n_planes == n_var
    assert set(planes[:n_var]) == {1}, "multi-plane variant present"
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    arr = np.frombuffer(geno, np.uint8).reshape(n_var, n_samp * 2 // 4)
    a0, a1 = arr & 3, (arr >> 2) & 3
    b0, b1 = (arr >> 4) & 3, (arr >> 6) & 3
    def classes(x, y):
        ok = (x != 3) & (y != 3)
        dos = (x == 0).astype(np.int64) + (y == 0).astype(np.int64)
        return [np.where(ok & (dos == d), 1, 0).sum(axis=1, dtype=np.int64)
                for d in (0, 1, 2)]
    ca, cb = classes(a0, a1), classes(b0, b1)
    d0, d1, d2 = (ca[i] + cb[i] for i in range(3))
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, n_dos0 BIGINT, "
                "n_het BIGINT, n_dos2 BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)",
                    [(int(v), int(x), int(h), int(z))
                     for v, x, h, z in zip(vids, d0, d1, d2)])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n_var} variants, sum_het={d1.sum()}")


def dump_positions(path, out_parquet):
    """Per-variant (variant_id, pos) of a GDS file, decoded independently
    of the Scala engine — the join key for positional-window oracles."""
    import numpy as np
    data = open(path, "rb").read()
    st = streams(data)
    vid_raw, vr = node_bytes(st, ["variant.id"])
    pos_raw, pr = node_bytes(st, ["position"])
    n_var = vr["dims"][0]
    assert pr["dims"][0] == n_var
    vids = np.frombuffer(vid_raw, "<i4", count=n_var)
    pos = np.frombuffer(pos_raw, "<i4", count=n_var)
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE t (variant_id BIGINT, pos BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(int(v), int(p)) for v, p in zip(vids, pos)])
    con.execute(f"COPY t TO '{out_parquet}' (FORMAT PARQUET)")
    print(f"{out_parquet}: {n_var} variants, pos [{pos.min()}, {pos.max()}]")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "dump-stats":
        dump_1kg_stats(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-codes":
        dump_code_counts(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-pos":
        dump_positions(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-families":
        dump_families(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-alleles":
        dump_alleles(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-dosage":
        dump_1kg_dosage(sys.argv[2], sys.argv[3],
                        int(sys.argv[4]) if len(sys.argv) > 4 else 1000)
    elif len(sys.argv) > 2 and sys.argv[1] == "dump-ds":
        dump_imputed_ds(sys.argv[2], sys.argv[3])
    else:
        main(sys.argv[1])
