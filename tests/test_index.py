"""Index build parity vs the reference's binary .mmi dumps."""
import numpy as np
import pytest

from mm2tpu.io.bseq import read_fastx
from mm2tpu.index.build import build_index, save_index, load_index, MM_I_HPC
from mm2tpu.index.mmi import read_mmi, write_mmi


def _build_from_fasta(path, w, k, flag=0):
    seqs = list(read_fastx(str(path)))
    return build_index([s.name for s in seqs], [s.seq for s in seqs],
                       w=w, k=k, flag=flag)


@pytest.mark.parametrize("mmi,w,k,flag", [
    ("mapont_MTorang.mmi", 10, 15, 0),
    ("mappb_MTorang.mmi", 10, 19, MM_I_HPC),
])
def test_index_matches_reference_mmi(golden_dir, ref_test_dir, mmi, w, k, flag):
    ref = read_mmi(str(golden_dir / mmi))
    ours = _build_from_fasta(ref_test_dir / "MT-orang.fa", w=w, k=k, flag=flag)
    assert ref.w == ours.w and ref.k == ours.k and (ref.flag & 1) == (flag & 1)
    assert [s.name for s in ref.seq] == [s.name for s in ours.seq]
    assert [s.length for s in ref.seq] == [s.length for s in ours.seq]
    np.testing.assert_array_equal(ref.keys, ours.keys)
    np.testing.assert_array_equal(ref.cnt, ours.cnt)
    np.testing.assert_array_equal(ref.start, ours.start)
    np.testing.assert_array_equal(ref.pos, ours.pos)
    if ref.S is not None and ours.S is not None:
        np.testing.assert_array_equal(ref.S[: len(ours.S)], ours.S)


def test_mmi_roundtrip(golden_dir, tmp_path):
    ref = read_mmi(str(golden_dir / "mapont_MTorang.mmi"))
    write_mmi(ref, str(tmp_path / "rt.mmi"))
    rt = read_mmi(str(tmp_path / "rt.mmi"))
    np.testing.assert_array_equal(ref.keys, rt.keys)
    np.testing.assert_array_equal(ref.cnt, rt.cnt)
    np.testing.assert_array_equal(ref.pos, rt.pos)
    if ref.S is not None:
        np.testing.assert_array_equal(ref.S, rt.S)


def test_npz_roundtrip(golden_dir, tmp_path):
    ref = read_mmi(str(golden_dir / "mapont_MTorang.mmi"))
    save_index(ref, str(tmp_path / "idx.npz"))
    rt = load_index(str(tmp_path / "idx.npz"))
    np.testing.assert_array_equal(ref.keys, rt.keys)
    np.testing.assert_array_equal(ref.pos, rt.pos)
    assert [s.name for s in ref.seq] == [s.name for s in rt.seq]


def test_get_and_max_occ(golden_dir, ref_test_dir):
    mi = _build_from_fasta(ref_test_dir / "MT-orang.fa", w=10, k=15)
    # every key must be retrievable and runs position-sorted
    for i in np.random.default_rng(0).choice(len(mi.keys), 50, replace=False):
        run = mi.get(int(mi.keys[i]))
        assert len(run) == mi.cnt[i]
        assert np.all(np.diff(run.astype(np.uint64)) >= 0)
    assert mi.get(0xDEADBEEF) is not None  # miss returns empty
    assert len(mi.get(0xDEADBEEF)) in (0, mi.cnt[np.searchsorted(mi.keys, 0xDEADBEEF)] if np.searchsorted(mi.keys, 0xDEADBEEF) < len(mi.keys) and mi.keys[np.searchsorted(mi.keys, 0xDEADBEEF)] == 0xDEADBEEF else 0)
    assert mi.cal_max_occ(2e-4) >= 1


def test_index_parts_fasta_split(tmp_path):
    """FASTA part splitting at batch/mini-batch granularity
    (index.c:280-302 + bseq chunking semantics)."""
    from mm2tpu.cli import index_parts
    from mm2tpu.options import IdxOptions
    fa = tmp_path / "multi.fa"
    seqs = [("s%d" % i, "ACGTACGTAT" * (40 + i)) for i in range(6)]
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in seqs))
    io = IdxOptions(k=7, w=4)
    io.mini_batch_size = 500   # one mini-batch grabs reads until >= 500 bases
    io.batch_size = 600        # a part takes mini-batches while sum <= 600
    parts = list(index_parts(str(fa), io))
    assert len(parts) > 1
    names = [s.name for p in parts for s in p.seq]
    assert names == [n for n, _ in seqs]
    # every part but the last exceeds batch_size (it stops only after
    # crossing), matching the reference's boundary rule
    for p in parts[:-1]:
        assert sum(s.length for s in p.seq) > io.batch_size


def test_multipart_mmi_roundtrip(tmp_path):
    from mm2tpu.index.build import build_index
    from mm2tpu.index.mmi import write_mmi, read_mmi_parts
    p0 = build_index(["a"], ["ACGTACGTACGTACGTACGT" * 10], w=4, k=7)
    p1 = build_index(["b"], ["TTTTACGTACGTACGTACGA" * 10], w=4, k=7)
    out = tmp_path / "two.mmi"
    write_mmi(p0, str(out))
    write_mmi(p1, str(out), append=True)
    parts = list(read_mmi_parts(str(out)))
    assert [m.seq[0].name for m in parts] == ["a", "b"]
    assert all(len(m.keys) > 0 for m in parts)


def test_get_many_query_above_last_bucket():
    """Regression: the two-level lookup must not index past keys/LUT for
    queries hashing above the last indexed key (found by fuzzing)."""
    import numpy as np
    from mm2tpu.index.build import MMIndex
    keys = np.sort(np.unique(np.random.default_rng(0).integers(
        0, 2**29, 80000, dtype=np.uint64)))
    mi = MMIndex(w=10, k=15, b=14, flag=0)
    mi.keys = keys
    mi.start = np.arange(len(keys), dtype=np.int64)
    mi.cnt = np.ones(len(keys), np.int32)
    q = np.array([2**30 - 1, int(keys[-1]), int(keys[0]),
                  2**29 + 12345], np.uint64)
    start, cnt = mi.get_many(q)
    assert list(cnt) == [0, 1, 1, 0]
    assert start[1] == len(keys) - 1 and start[2] == 0


def test_mmx_cli_roundtrip(golden_dir, ref_test_dir, tmp_path):
    """-d foo.mmx writes the mmap-native MMX1 format; mapping from it is
    byte-identical to mapping from the FASTA (device-ready index
    checkpoint, SURVEY §5)."""
    import io as _io
    from contextlib import redirect_stdout
    from mm2tpu.cli import main as cli_main
    idx = tmp_path / "idx.mmx"
    rc = cli_main(["-x", "map-ont", "-d", str(idx),
                   str(ref_test_dir / "MT-orang.fa")])
    assert rc == 0
    assert open(idx, "rb").read(4) == b"MMX1"
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(["-x", "map-ont", "-c", str(idx),
                       str(ref_test_dir / "MT-human.fa")])
    assert rc == 0
    assert buf.getvalue() == (golden_dir / "mapont_MT_c.paf").read_text()


def test_legacy_npz_still_loads(golden_dir, tmp_path):
    """Round-1 .npz indices (np.savez_compressed) remain loadable."""
    import numpy as np
    from mm2tpu.index.mmi import read_mmi
    mi = read_mmi(str(golden_dir / "mapont_MTorang.mmi"))
    p = str(tmp_path / "legacy.npz")
    np.savez_compressed(
        p,
        header=np.array([mi.w, mi.k, mi.b, mi.flag, mi.n_seq, mi.index],
                        np.int64),
        names=np.array([s.name or "" for s in mi.seq]),
        lens=np.array([s.length for s in mi.seq], np.int64),
        offsets=np.array([s.offset for s in mi.seq], np.int64),
        is_alt=np.array([s.is_alt for s in mi.seq], bool),
        keys=mi.keys, start=mi.start, cnt=mi.cnt, pos=mi.pos,
        S=mi.S if mi.S is not None else np.zeros(0, np.uint32),
        has_S=np.array([mi.S is not None]))
    rt = load_index(p)
    np.testing.assert_array_equal(mi.keys, rt.keys)
    np.testing.assert_array_equal(mi.pos, rt.pos)


def test_mmi_cache_sidecar(ref_test_dir, tmp_path):
    """--mmi-cache: first load converts .mmi parts to an MMX sidecar
    dir, later loads serve from it; output byte-identical either way,
    including multi-part (-I) indices."""
    import io as _io
    import json
    import os
    from contextlib import redirect_stdout
    from mm2tpu.cli import main as cli_main

    def run(args):
        buf = _io.StringIO()
        with redirect_stdout(buf):
            assert cli_main(args.split()) == 0
        return buf.getvalue()

    ref = str(tmp_path / "two.fa")
    with open(ref, "w") as fh:
        for src in ("MT-orang.fa", "MT-human.fa"):
            fh.write(open(f"{ref_test_dir}/{src}").read())
    qry = f"{ref_test_dir}/MT-human.fa"
    mmi = str(tmp_path / "mt.mmi")
    run(f"-x map-ont -I 9k -d {mmi} {ref}")  # one part per contig
    plain = run(f"-x map-ont -c {mmi} {qry}")
    first = run(f"-x map-ont -c --mmi-cache {mmi} {qry}")
    meta_p = tmp_path / "mt.mmi.mmxcache" / "meta.json"
    meta = json.loads(meta_p.read_text())
    assert meta["n_parts"] == 2
    stamp = os.path.getmtime(meta_p)
    cached = run(f"-x map-ont -c --mmi-cache {mmi} {qry}")
    assert first == plain and cached == plain
    assert os.path.getmtime(meta_p) == stamp  # second run reused it
    # a torn cache (part file deleted under a valid meta) must fall
    # back to plain parsing BEFORE yielding anything — no duplicated
    # part-0 mappings (each part's hits print separately)
    os.unlink(tmp_path / "mt.mmi.mmxcache" / "part1.mmx")
    torn = run(f"-x map-ont -c --mmi-cache {mmi} {qry}")
    assert torn == plain
    # stale cache (touched .mmi) is rebuilt, not served
    os.utime(mmi, (os.path.getmtime(mmi) + 5,) * 2)
    rebuilt = run(f"-x map-ont -c --mmi-cache {mmi} {qry}")
    assert rebuilt == plain
    assert os.path.getmtime(meta_p) > stamp
