"""mappy-compatible API tests, cross-checked against the golden PAF
(the reference binary's -c output contains exactly the fields Alignment
exposes: coordinates, strand, mlen/blen, mapq, tp, cigar, cs)."""
import pytest

from mm2tpu import mappy

T = "/root/reference/test"


@pytest.fixture(scope="module")
def aligner():
    return mappy.Aligner(f"{T}/MT-orang.fa", preset="map-ont")


def golden_rows(golden_dir, name):
    rows = []
    for line in (golden_dir / name).read_text().splitlines():
        c = line.split("\t")
        tags = dict((t.split(":", 1)[0], t.split(":", 2)[2]) for t in c[12:])
        rows.append((c[0], int(c[1]), int(c[2]), int(c[3]), c[4], c[5],
                     int(c[6]), int(c[7]), int(c[8]), int(c[9]), int(c[10]),
                     int(c[11]), tags))
    return rows


def test_map_vs_golden_paf(aligner, golden_dir, ref_test_dir):
    reads = {name: seq for name, seq, _ in
             mappy.fastx_read(f"{T}/MT-human.fa")}
    gold = golden_rows(golden_dir, "mapont_MT_cs.paf")
    for (qn, qlen, qs, qe, strand, ctg, clen, rs, re, mlen, blen, mapq,
         tags) in gold:
        hits = list(aligner.map(reads[qn], cs=True))
        h = [x for x in hits if (x.q_st, x.r_st) == (qs, rs)][0]
        assert h.ctg == ctg and h.ctg_len == clen
        assert (h.q_en, h.r_en) == (qe, re)
        assert h.strand == (1 if strand == "+" else -1)
        assert (h.mlen, h.blen, h.mapq) == (mlen, blen, mapq)
        assert h.is_primary == (tags["tp"] == "P")
        assert h.cigar_str == tags["cg"]
        assert h.cs == tags["cs"]
        assert h.NM == int(tags["NM"])
        # __str__ round-trips the PAF-like body
        assert str(h).startswith(f"{qs}\t{qe}\t{strand}\t{ctg}")


def test_md(aligner, golden_dir):
    reads = {n: s for n, s, _ in mappy.fastx_read(f"{T}/MT-human.fa")}
    md_gold = {}
    for line in (golden_dir / "mapont_MT_md.sam").read_text().splitlines():
        if line.startswith("@"):
            continue
        c = line.split("\t")
        for t in c[11:]:
            if t.startswith("MD:Z:"):
                md_gold[(c[0], int(c[3]) - 1)] = t[5:]
    for h in aligner.map(reads["MT_human"], MD=True):
        if (("MT_human", h.r_st)) in md_gold:
            assert h.MD == md_gold[("MT_human", h.r_st)]


def test_seq_fetch(aligner):
    ref = {n: s for n, s, _ in mappy.fastx_read(f"{T}/MT-orang.fa")}
    name = aligner.seq_names[0]
    full = aligner.seq(name)
    assert full == ref[name].upper()
    assert aligner.seq(name, 100, 132) == ref[name].upper()[100:132]
    assert aligner.seq("nonexistent") is None
    assert aligner.k == 15 and aligner.w == 10 and aligner.n_seq == 1


def test_seq_index_and_revcomp():
    ref = next(mappy.fastx_read(f"{T}/MT-orang.fa"))[1]
    a = mappy.Aligner(seq=ref)
    assert a and a.seq_names == ["N/A"]
    read = ref[3000:3500]
    hits = list(a.map(read))
    assert hits and hits[0].r_st == 3000 and hits[0].strand == 1
    rhits = list(a.map(mappy.revcomp(read)))
    assert rhits and rhits[0].r_st == 3000 and rhits[0].strand == -1
    assert mappy.revcomp("ACGTNacgtnRYKM") == "KMRYnacgtNACGT"


def test_empty_aligner():
    a = mappy.Aligner()
    assert not a
    assert list(a.map("ACGT") or []) == []


def test_fastx_read_comment(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1 some comment\nACGT\n+\nIIII\n")
    recs = list(mappy.fastx_read(str(p), read_comment=True))
    assert recs == [("r1", "ACGT", "IIII", "some comment")]


def test_aligner_accepts_mmx(tmp_path):
    """Aligner(fn_idx_in=...) opens the TPU build's native MMX index
    (mmap, index/build.py) in addition to .mmi — same hits either way."""
    from mm2tpu import mappy
    from mm2tpu.io.bseq import read_fastx
    from mm2tpu.index.build import build_index, save_index

    ref = "/root/reference/test/MT-orang.fa"
    refs = list(read_fastx(ref))
    mi = build_index([r.name for r in refs], [r.seq for r in refs])
    mmx = str(tmp_path / "mt.mmx")
    save_index(mi, mmx)
    a_fa = mappy.Aligner(ref, preset="map-ont")
    a_mmx = mappy.Aligner(mmx, preset="map-ont")
    assert a_mmx  # truthy: index loaded
    assert a_mmx.seq_names == a_fa.seq_names
    q = next(iter(read_fastx("/root/reference/test/MT-human.fa"))).seq
    hits_fa = [str(h) for h in a_fa.map(q)]
    hits_mmx = [str(h) for h in a_mmx.map(q)]
    assert hits_mmx == hits_fa and hits_mmx
