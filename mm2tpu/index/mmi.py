"""Reader/writer for the reference binary index format (.mmi, magic MMI\\2).

Format (index.c:440-534): header (w,k,b,n_seq,flag as uint32), per-seq
name-length/name/len records, then 1<<b buckets each holding a position
array p[] and khash (key,val) pairs, then the 4-bit packed reference.

The khash key stores minier>>b (low b bits are the bucket number); LSB set
means singleton with the position inlined in val, otherwise
val = start<<32 | count into p[] (index.c:91-97).

Reading reconstructs our CSR layout exactly. Writing emits keys in sorted
order per bucket — a valid .mmi (pair order within a bucket is
reader-irrelevant), though not byte-identical to the C writer's khash
iteration order.
"""
from __future__ import annotations

import struct

import numpy as np

from .build import MMIndex, RefSeq, MM_I_NO_SEQ

MAGIC = b"MMI\x02"


def read_mmi(path: str) -> MMIndex:
    """Read the first part of a .mmi file."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError("not a .mmi index")
        return _read_part(f)


def read_mmi_parts(path: str):
    """Generator over all parts of a (possibly multi-part) .mmi file
    (mm_idx_reader_read/eof semantics, index.c:586-605)."""
    with open(path, "rb") as f:
        while True:
            magic = f.read(4)
            if len(magic) < 4:
                return
            if magic != MAGIC:
                raise ValueError("corrupt .mmi part header")
            yield _read_part(f)


def _read_part(f) -> MMIndex:
    w, k, b, n_seq, flag = struct.unpack("<5I", f.read(20))
    mi = MMIndex(w=w, k=k, b=b, flag=flag)
    sum_len = 0
    for _ in range(n_seq):
        (l,) = struct.unpack("<B", f.read(1))
        name = f.read(l).decode() if l else None
        (ln,) = struct.unpack("<I", f.read(4))
        mi.seq.append(RefSeq(name=name, offset=sum_len, length=ln))
        sum_len += ln
    miniers, starts, cnts, pos_chunks = [], [], [], []
    total = 0
    for bucket in range(1 << b):
        (n,) = struct.unpack("<i", f.read(4))
        p = np.frombuffer(f.read(8 * n), dtype=np.uint64)
        (size,) = struct.unpack("<I", f.read(4))
        if size == 0:
            continue
        kv = np.frombuffer(f.read(16 * size), dtype=np.uint64).reshape(-1, 2)
        key, val = kv[:, 0], kv[:, 1]
        minier = (key >> np.uint64(1)) << np.uint64(b) | np.uint64(bucket)
        single = (key & np.uint64(1)) != 0
        for j in np.argsort(minier):
            miniers.append(int(minier[j]))
            starts.append(total)
            if single[j]:
                cnts.append(1)
                pos_chunks.append(np.array([val[j]], dtype=np.uint64))
                total += 1
            else:
                st, c = int(val[j] >> np.uint64(32)), int(val[j] & np.uint64(0xFFFFFFFF))
                cnts.append(c)
                pos_chunks.append(p[st: st + c])
                total += c
    if not (flag & MM_I_NO_SEQ):
        mi.S = np.frombuffer(f.read(4 * ((sum_len + 7) // 8)), dtype=np.uint32)
    if miniers:
        miniers = np.array(miniers, dtype=np.uint64)
        order = np.argsort(miniers, kind="stable")
        mi.keys = miniers[order]
        pos = np.concatenate(pos_chunks)
        starts = np.array(starts, dtype=np.int64)[order]
        cnts = np.array(cnts, dtype=np.int32)[order]
        # re-pack pos into key-sorted order
        out = np.empty(total, dtype=np.uint64)
        new_starts = np.empty(len(order), dtype=np.int64)
        o = 0
        for i in range(len(order)):
            c = int(cnts[i])
            out[o: o + c] = pos[starts[i]: starts[i] + c]
            new_starts[i] = o
            o += c
        mi.keys, mi.start, mi.cnt, mi.pos = mi.keys, new_starts, cnts, out
    return mi


def write_mmi(mi: MMIndex, path: str, append: bool = False) -> None:
    """Write one index part; append=True adds a part to an existing file
    (multi-part dump, mm_idx_dump per reader part)."""
    b = mi.b
    mask = np.uint64((1 << b) - 1)
    bucket_of = (mi.keys & mask).astype(np.int64) if len(mi.keys) else np.zeros(0, np.int64)
    with open(path, "ab" if append else "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<5I", mi.w, mi.k, mi.b, mi.n_seq, mi.flag))
        sum_len = 0
        for s in mi.seq:
            name = (s.name or "").encode()
            f.write(struct.pack("<B", len(name)))
            f.write(name)
            f.write(struct.pack("<I", s.length))
            sum_len += s.length
        order = np.argsort(bucket_of, kind="stable")
        by_bucket = {}
        for j in order:
            by_bucket.setdefault(int(bucket_of[j]), []).append(int(j))
        for bucket in range(1 << b):
            idxs = by_bucket.get(bucket, [])
            p_parts, kvs = [], []
            start_p = 0
            for j in idxs:
                minier = int(mi.keys[j])
                c = int(mi.cnt[j])
                key = (minier >> b) << 1
                if c == 1:
                    kvs.append((key | 1, int(mi.pos[int(mi.start[j])])))
                else:
                    run = mi.pos[int(mi.start[j]): int(mi.start[j]) + c]
                    p_parts.append(run)
                    kvs.append((key, start_p << 32 | c))
                    start_p += c
            p = np.concatenate(p_parts) if p_parts else np.zeros(0, np.uint64)
            f.write(struct.pack("<i", len(p)))
            f.write(p.astype(np.uint64).tobytes())
            f.write(struct.pack("<I", len(kvs)))
            for key, val in kvs:
                f.write(struct.pack("<2Q", key, val))
        if not (mi.flag & MM_I_NO_SEQ) and mi.S is not None:
            f.write(mi.S.astype(np.uint32).tobytes())
