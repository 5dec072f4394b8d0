"""Tests for mm2tpu.tools.paftools (reference: misc/paftools.js).

Differential strategy: where possible, cross-check one subcommand's output
against an independent artifact (sam2paf's MD-derived cs tag vs the cs tag
minimap2 itself emitted; stat over PAF vs stat over SAM of the same mapping).
Everything else is verified on small hand-computed fixtures.
"""
import io
from contextlib import redirect_stderr, redirect_stdout

import pytest

from mm2tpu.tools.paftools import main as pt_main


def run(args, expect_rc=0):
    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        rc = pt_main(args)
    assert rc == expect_rc, err.getvalue()
    return out.getvalue(), err.getvalue()


# ---------------------------------------------------------------------------
# sam2paf


def test_sam2paf_md_reconstructs_cs(golden_dir):
    """cs reconstructed from the SAM MD tag must equal the cs tag minimap2
    emitted directly in PAF (short form)."""
    out, _ = run(["sam2paf", str(golden_dir / "mapont_MT_md.sam")])
    lines = [l for l in out.splitlines() if l]
    assert len(lines) == 1
    got = dict(c.split(":", 2)[0::2] for c in lines[0].split("\t")[12:])
    paf = (golden_dir / "mapont_MT_cs.paf").read_text().splitlines()[0]
    want = dict(c.split(":", 2)[0::2] for c in paf.split("\t")[12:])
    assert "cs" in got and got["cs"] == want["cs"]
    assert got["cg"] == want["cg"]


def test_sam2paf_matches_paf_coords(golden_dir):
    out, _ = run(["sam2paf", str(golden_dir / "mapont_MT_a.sam")])
    got = out.splitlines()[0].split("\t")
    want = (golden_dir / "mapont_MT_c.paf").read_text().splitlines()[0]
    want = want.split("\t")
    # qname qlen qs qe strand tname tlen ts te mlen blen
    assert got[:11] == want[:11]


def test_sam2paf_paired_end(golden_dir):
    out, _ = run(["sam2paf", str(golden_dir / "sr_pe_MT.sam")])
    names = [l.split("\t")[0] for l in out.splitlines()]
    assert names and all(n.endswith(("/1", "/2")) for n in names)


# ---------------------------------------------------------------------------
# stat


def test_stat_paf_sam_consistency(golden_dir):
    """The gap histogram and base counts must agree between the PAF and SAM
    renderings of the same alignment."""
    paf_out, _ = run(["stat", str(golden_dir / "mapont_MT_c.paf")])
    sam_out, _ = run(["stat", str(golden_dir / "mapont_MT_a.sam")])

    def grab(txt, key):
        for line in txt.splitlines():
            if line.startswith(key):
                return line.split(": ")[1]
        raise KeyError(key)

    for key in ("Number of mapped sequences", "Number of primary alignments",
                "Number of mapped bases",
                "Number of insertions in [0,50)",
                "Number of deletions in [0,50)"):
        assert grab(paf_out, key) == grab(sam_out, key), key
    assert grab(paf_out, "Number of mapped sequences") == "1"
    # MT_human read: qlen 16569
    assert grab(paf_out, "Number of bases in mapped sequences") == "16569"
    assert grab(paf_out, "Number of mapped bases") == "15993"


def test_stat_gap_output(golden_dir):
    out, _ = run(["stat", "-l", "10", str(golden_dir / "mapont_MT_c.paf")])
    for line in out.splitlines():
        t = line.split("\t")
        assert t[0] == "MT_human" and t[5] in "ID" and int(t[6]) >= 10


# ---------------------------------------------------------------------------
# view


def test_view_blast_like(golden_dir):
    out, _ = run(["view", str(golden_dir / "mapont_MT_cs.paf")])
    lines = out.splitlines()
    assert lines[0].startswith(">MT_human")
    assert lines[-1] == "//"
    ref_lines = [l for l in lines if l.startswith("Ref+:")]
    qry_lines = [l for l in lines if l.startswith("Qry+:")]
    assert ref_lines and len(ref_lines) == len(qry_lines)
    # first block starts at target pos 0 -> 1-based 1, query 576 -> 577
    assert ref_lines[0].split()[1] == "1"
    assert qry_lines[0].split()[1] == "577"


def test_view_lastz(golden_dir):
    out, _ = run(["view", "-f", "lastz-cigar",
                  str(golden_dir / "mapont_MT_c.paf")])
    t = out.split()
    assert t[0] == "cigar:" and t[1] == "MT_human"


# ---------------------------------------------------------------------------
# mapeval


def test_mapeval_paf(tmp_path):
    # simulated names: read!chr!st!en!strand ; aln cols 6-9 target/pos
    paf = tmp_path / "sim.paf"
    rows = [
        # correct, mapq 60
        ("r1!chr1!1000!2000!+", 1000, 0, 1000, "+",
         "chr1", 5000, 1000, 2000, 900, 1000, 60),
        # wrong chromosome, mapq 60
        ("r2!chr1!1000!2000!+", 1000, 0, 1000, "+",
         "chr2", 5000, 1000, 2000, 900, 1000, 60),
        # wrong strand (simulated '-', aligned '+'), mapq 10
        ("r3!chr1!3000!4000!-", 1000, 0, 1000, "+",
         "chr1", 5000, 3000, 4000, 900, 1000, 10),
    ]
    paf.write_text("".join("\t".join(map(str, r)) + "\ttp:A:P\n"
                           for r in rows))
    out, _ = run(["mapeval", str(paf)])
    lines = [l.split("\t") for l in out.splitlines()]
    # ROC rows break at quality levels with errors (paftools.js:2150-2160)
    assert lines[0][:4] == ["Q", "60", "2", "1"]
    assert abs(float(lines[0][4]) - 1 / 2) < 1e-9
    assert lines[1][:4] == ["Q", "10", "1", "1"]
    assert abs(float(lines[1][4]) - 2 / 3) < 1e-9
    assert lines[1][5] == "3"


def test_mapeval_error_print(tmp_path):
    paf = tmp_path / "sim.paf"
    paf.write_text("\t".join(map(str, (
        "r2!chr1!1000!2000!+", 1000, 0, 1000, "+",
        "chr2", 5000, 1000, 2000, 900, 1000, 60))) + "\n")
    out, _ = run(["mapeval", "-Q", "10", str(paf)])
    assert out.splitlines()[0].startswith("E\tr2!chr1!1000!2000!+")


# ---------------------------------------------------------------------------
# liftover


def test_liftover(tmp_path):
    # query q1 (len 100) maps + to t1:1000, cigar 50M10D50M
    # query bases [0,100) -> target [1000,1050) + [1060,1110)
    paf = tmp_path / "aln.paf"
    paf.write_text("\t".join(map(str, (
        "q1", 100, 0, 100, "+", "t1", 5000, 1000, 1110, 95, 110, 60,
        "tp:A:P", "cg:Z:50M10D50M"))) + "\n")
    bed = tmp_path / "q.bed"
    bed.write_text("q1\t10\t20\nq1\t45\t55\n")
    out, _ = run(["liftover", "-l", "0", str(paf), str(bed)])
    lines = [l.split("\t") for l in out.splitlines()]
    assert lines[0] == ["t1", "1010", "1020", "q1_10_20", "0", "+"]
    # q[45,55): q45..q49 -> t1045..1049; q50 -> t1060 => [1045, 1065)
    assert lines[1] == ["t1", "1045", "1065", "q1_45_55", "0", "+"]


def test_liftover_minus_strand(tmp_path):
    # q2 len 100 maps - to t1:[1000,1100), cigar 100M
    # query [10,20) on '-' => target [1080, 1090)
    paf = tmp_path / "aln.paf"
    paf.write_text("\t".join(map(str, (
        "q2", 100, 0, 100, "-", "t1", 5000, 1000, 1100, 100, 100, 60,
        "tp:A:P", "cg:Z:100M"))) + "\n")
    bed = tmp_path / "q.bed"
    bed.write_text("q2\t10\t20\n")
    out, _ = run(["liftover", "-l", "0", str(paf), str(bed)])
    assert out.splitlines()[0].split("\t") == \
        ["t1", "1080", "1090", "q2_10_20", "0", "-"]


# ---------------------------------------------------------------------------
# call


def test_call_variants(tmp_path):
    # one contig, 20kb alignment with a SNP, an insertion and a deletion
    paf = tmp_path / "asm.paf"
    cs = "cs:Z::9999*ac:5000+tt:2000-gga:2998"
    paf.write_text("\t".join(map(str, (
        "ctg1", 20001, 0, 20001, "+", "chr1", 30000, 0, 20002,
        19997, 20002, 60, "tp:A:P", cs))) + "\n")
    out, err = run(["call", "-l", "10000", "-L", "10000", str(paf)])
    lines = [l.split("\t") for l in out.splitlines()]
    vs = [l for l in lines if l[0] == "V"]
    rs = [l for l in lines if l[0] == "R"]
    assert rs == [["R", "chr1", "0", "20002"]]
    assert len(vs) == 3
    # SNP at ref 9999: a->c
    assert vs[0][1:4] == ["chr1", "9999", "10000"]
    assert vs[0][6:8] == ["a", "c"]
    # insertion at ref 15000
    assert vs[1][2:4] == ["15000", "15000"] and vs[1][6:8] == ["-", "tt"]
    # deletion at ref 17000
    assert vs[2][2:4] == ["17000", "17003"] and vs[2][6:8] == ["gga", "-"]
    assert "1 substitutions" in err
    assert "1 [3,50) deletions" in err


def test_call_vcf(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\n" + "A" * 30000 + "\n")
    paf = tmp_path / "asm.paf"
    paf.write_text("\t".join(map(str, (
        "ctg1", 20001, 0, 20001, "+", "chr1", 30000, 0, 20002,
        19997, 20002, 60, "tp:A:P",
        "cs:Z::9999*ac:5000+tt:2000-gga:2998"))) + "\n")
    out, _ = run(["call", "-l", "10000", "-L", "10000",
                  "-f", str(fa), str(paf)])
    lines = [l for l in out.splitlines() if not l.startswith("#")]
    t = [l.split("\t") for l in lines]
    assert t[0][:5] == ["chr1", "10000", ".", "A", "C"]
    assert t[1][:5] == ["chr1", "15000", ".", "A", "ATT"]
    assert t[2][:5] == ["chr1", "17000", ".", "AGGA", "A"]


# ---------------------------------------------------------------------------
# junceval / gff2bed


GTF = """\
chr1\ttest\texon\t101\t200\t.\t+\t.\ttranscript_id "tx1"; gene_name "G1";
chr1\ttest\texon\t301\t400\t.\t+\t.\ttranscript_id "tx1"; gene_name "G1";
chr1\ttest\texon\t501\t600\t.\t+\t.\ttranscript_id "tx1"; gene_name "G1";
"""


def test_junceval(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(GTF)
    # read with introns [200,300) (correct) and [700,800) (novel —
    # overlapping no annotated intron)
    sam = tmp_path / "a.sam"
    sam.write_text("r1\t0\tchr1\t151\t60\t50M100N400M100N50M\t*\t0\t0\t"
                   + "A" * 500 + "\t*\n")
    out, _ = run(["junceval", str(gtf), str(sam)])
    assert "# predicted introns: 2" in out
    assert "# correct introns: 1 (50.00%)" in out
    assert "# non-overlapping introns: 1" in out


def test_junceval_fuzzy(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(GTF)
    sam = tmp_path / "a.sam"
    # intron [198,300): 2bp off at donor
    sam.write_text("r1\t0\tchr1\t149\t60\t50M102N100M\t*\t0\t0\t"
                   + "A" * 150 + "\t*\n")
    out, _ = run(["junceval", str(gtf), str(sam)])
    assert "# correct introns: 0" in out
    out, _ = run(["junceval", "-l", "2", str(gtf), str(sam)])
    assert "# correct introns: 1" in out


def test_gff2bed(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(GTF)
    out, _ = run(["gff2bed", str(gtf)])
    t = out.splitlines()[0].split("\t")
    assert t[:4] == ["chr1", "100", "600", "tx1||G1"]
    assert t[9:12] == ["3", "100,100,100,", "0,200,400,"]
    out, _ = run(["gff2bed", "-j", str(gtf)])
    juncs = [l.split("\t") for l in out.splitlines()]
    assert juncs[0][:3] == ["chr1", "200", "300"]
    assert juncs[1][:3] == ["chr1", "400", "500"]


# ---------------------------------------------------------------------------
# splice2bed


def test_splice2bed(tmp_path):
    paf = tmp_path / "s.paf"
    paf.write_text("\t".join(map(str, (
        "r1", 200, 0, 200, "+", "chr1", 10000, 100, 500, 190, 200, 60,
        "s2:i:0", "cg:Z:100M200N100M"))) + "\n")
    out, _ = run(["splice2bed", str(paf)])
    t = out.splitlines()[0].split("\t")
    assert t[:4] == ["chr1", "100", "500", "r1"]
    assert t[9:12] == ["2", "100,100,", "0,300,"]


# ---------------------------------------------------------------------------
# bedcov


def test_bedcov(tmp_path):
    regions = tmp_path / "r.bed"
    regions.write_text("chr1\t100\t200\nchr1\t400\t500\n")
    target = tmp_path / "t.bed"
    target.write_text("chr1\t150\t450\n")
    out, err = run(["bedcov", "-p", str(regions), str(target)])
    t = out.splitlines()[0].split("\t")
    assert t[0] == "F" and t[-2:] == ["300", "100"]  # 50 + 50 covered
    assert "# target bases: 300" in err
    assert "overlapping regions: 100 (33.33%)" in err


# ---------------------------------------------------------------------------
# ov-eval


def test_ov_eval(tmp_path):
    # two reads overlapping by 3000bp on the reference; overlapper found it
    ref_paf = tmp_path / "toref.paf"
    rows = [
        ("r1", 8000, 0, 8000, "+", "chr1", 99000, 0, 8000, 7900, 8000, 60,
         "tp:A:P"),
        ("r2", 8000, 0, 8000, "+", "chr1", 99000, 5000, 13000, 7900, 8000,
         60, "tp:A:P"),
        ("r3", 8000, 0, 8000, "+", "chr1", 99000, 40000, 48000, 7900, 8000,
         60, "tp:A:P"),
    ]
    ref_paf.write_text("".join("\t".join(map(str, r)) + "\n" for r in rows))
    ov = tmp_path / "ovlp.paf"
    ov.write_text("\t".join(map(str, (
        "r1", 8000, 5000, 8000, "+", "r2", 8000, 0, 3000, 2900, 3000,
        0))) + "\n")
    out, _ = run(["ov-eval", str(ref_paf), str(ov)])
    lines = out.splitlines()
    assert lines[0].startswith("1 overlaps")
    assert lines[1].startswith("0 missed")
    assert lines[2].startswith("100.00%")


# ---------------------------------------------------------------------------
# vcfstat


def test_vcfstat(tmp_path):
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t.\t.\t.\n"        # ts
        "chr1\t200\t.\tC\tA\t.\t.\t.\n"        # tv
        "chr1\t300\t.\tA\tATT\t.\t.\t.\n"      # 2bp ins
        "chr1\t400\t.\tACCC\tA\t.\t.\t.\n")    # 3bp del
    out, _ = run(["vcfstat", str(vcf)])
    assert "# substitutions: 2" in out
    assert "ts/tv: 1.000" in out
    assert "# 2bp insertions: 1" in out
    assert "# [3,50) deletions: 1" in out


# ---------------------------------------------------------------------------
# pbsim2fq / mason2fq


def test_pbsim2fq(tmp_path):
    fai = tmp_path / "ref.fa.fai"
    fai.write_text("chrA\t1000\t5\t80\t81\n")
    maf = tmp_path / "sim.maf"
    maf.write_text(
        "a\n"
        "s ref 100 10 + 1000 ACGTACGTAC\n"
        "s S1_1 0 10 + 10 ACGTACG-TAC\n\n")
    out, _ = run(["pbsim2fq", str(fai), str(maf)])
    lines = out.splitlines()
    assert lines[0] == ">S1_1!chrA!100!110!+"
    assert lines[1] == "ACGTACGTAC"


def test_mason2fq(tmp_path):
    sam = tmp_path / "m.sam"
    sam.write_text("simulated.1\t0\tchr1\t101\t60\t10M\t*\t0\t0\t"
                   "ACGTACGTAC\tIIIIIIIIII\tXE:i:1\tXS:i:2\tXI:i:0\n")
    out, _ = run(["mason2fq", str(sam)])
    lines = out.splitlines()
    assert lines[0] == "@1!chr1!100!110!+ 1:2:0"
    assert lines[1] == "ACGTACGTAC"
    assert lines[3] == "IIIIIIIIII"


def test_version():
    out, _ = run(["version"])
    assert out.strip()


def test_usage():
    _, _ = run([], expect_rc=1)


def test_delta2paf(tmp_path):
    # MUMmer delta: ref r1 (len 1000), qry q1 (len 500); alignment
    # r[101,200] x q[1,100], one deletion at offset 10 (ref base unmatched)
    delta = tmp_path / "a.delta"
    delta.write_text(
        "/ref /qry\nNUCMER\n"
        ">r1 q1 1000 500\n"
        "101 200 1 99 2 2 0\n"
        "10\n"
        "0\n")
    out, _ = run(["delta2paf", str(delta)])
    t = out.splitlines()[0].split("\t")
    assert t[0:2] == ["q1", "500"]
    assert t[4:9] == ["+", "r1", "1000", "100", "200"]
    assert "cg:Z:9M1D90M" in t
    assert "NM:i:2" in t
