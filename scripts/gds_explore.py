#!/usr/bin/env python3
"""Exploratory decoder for the CoreArray GDS container (public gdsfmt
format) — used to derive the Scala reader. Works from the bytes of the
reference fixtures; the VCF twin of CEU_Exon.gds is the oracle.

Container layout (recovered):
  [0..12)  magic "COREARRAYx0A"
  [12..14) version u16 (0x0100)
  [14..18) u32 = entry stream ID (1)
  [18..)   blocks: [size:u48][next:u48][id:u32][content: size-16]
           bit47 of size = head fragment of the stream; `next` = file
           position of the stream's next fragment (0 = end).
Stream 1 = root folder node record. Node records are CdSerial property
lists; folder records embed a child table (name -> child stream id).
"""
import struct, sys

def u16(b, o): return struct.unpack_from("<H", b, o)[0]
def u32(b, o): return struct.unpack_from("<I", b, o)[0]
def u48(b, o):
    lo, hi = struct.unpack_from("<IH", b, o)
    return lo | (hi << 32)

def scan_blocks(data):
    pos = 18
    frags = []
    while pos + 16 <= len(data):
        size = u48(data, pos)
        nxt = u48(data, pos + 6)
        bid = u32(data, pos + 12)
        head = bool(size >> 47)
        size &= (1 << 47) - 1
        frags.append(dict(id=bid, pos=pos, size=size, next=nxt, head=head))
        pos += size
    return frags, pos

def streams(data):
    """Reassemble stream id -> bytes by chaining head frag -> next."""
    frags, end = scan_blocks(data)
    by_pos = {f["pos"]: f for f in frags}
    out = {}
    for f in frags:
        if not f["head"]:
            continue
        buf = bytearray()
        cur = f
        while True:
            buf += data[cur["pos"] + 16: cur["pos"] + cur["size"]]
            if cur["next"] == 0:
                break
            cur = by_pos[cur["next"]]
        out[f["id"]] = bytes(buf)
    return out, frags, end

def folder_children(rec):
    """Heuristic folder-entry scan: entries are [len:u48][u16=3]
    [09 02 f5 00][child_id:u32][09 44 74 31][flags5][15 44 c6 60 10]
    [nameLen:u8][name]."""
    kids = []
    i = 0
    while i + 6 < len(rec):
        if rec[i:i+6] == bytes.fromhex("03000902f500"):
            start = i - 6
            elen = u48(rec, start)
            cid = u32(rec, i + 6)
            # name: last len-prefixed string in the entry
            j = i + 6 + 4
            name = None
            flags = None
            if rec[j:j+4] == bytes.fromhex("09447431"):
                flags = rec[j+4]
                j += 9
            if rec[j:j+5] == bytes.fromhex("1544c66010"):
                nl = rec[j+5]
                name = rec[j+6:j+6+nl].decode("utf-8", "replace")
            kids.append(dict(id=cid, name=name, flags=flags, entry_len=elen))
            i = start + elen
        else:
            i += 1
    return kids

def hexdump(b, prefix="  "):
    for o in range(0, len(b), 16):
        chunk = b[o:o+16]
        hx = " ".join(f"{c:02x}" for c in chunk)
        asc = "".join(chr(c) if 32 <= c < 127 else "." for c in chunk)
        print(f"{prefix}{o:05x}: {hx:<48} {asc}")

def main(path):
    data = open(path, "rb").read()
    assert data[:12] == b"COREARRAYx0A"
    print("version", hex(u16(data, 12)), "entry", u32(data, 14),
          "filesize", len(data))
    st, frags, end = streams(data)
    print(f"{len(frags)} frags -> {len(st)} streams; scan end {end}")
    for f in frags:
        print(f"  frag id={f['id']:<4} pos={f['pos']:<8} size={f['size']:<8}"
              f" next={f['next']:<8} head={f['head']}")
    root = st[u32(data, 14)]
    # node record streams begin [u48 len][u48 len2] then payload
    print("\n== root stream ==")
    hexdump(root[:200])
    print("\n== root children ==")
    for k in folder_children(root):
        print(" ", k)

if __name__ == "__main__":
    main(sys.argv[1])
