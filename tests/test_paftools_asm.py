"""Tests for the assembly-evaluation paftools subcommands
(reference: misc/paftools.js asmstat/asmgene/misjoin/vcfpair/sveval),
on small hand-computed fixtures."""
import io
from contextlib import redirect_stderr, redirect_stdout

from mm2tpu.tools.paftools import main as pt_main


def run(args, expect_rc=0):
    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        rc = pt_main(args)
    assert rc == expect_rc, err.getvalue()
    return out.getvalue(), err.getvalue()


def _paf_row(q, ql, qs, qe, strand, t, tl, ts, te, mlen, blen, mapq,
             *tags):
    return "\t".join(map(str, (q, ql, qs, qe, strand, t, tl, ts, te,
                               mlen, blen, mapq) + tags))


def test_asmstat(tmp_path):
    fai = tmp_path / "ref.fa.fai"
    fai.write_text("chr1\t1000000\t6\t80\t81\n")
    paf = tmp_path / "asm.paf"
    # two contigs covering [0,400k) and [500k,900k): Rcov 80%
    rows = [
        _paf_row("ctg1", 400000, 0, 400000, "+", "chr1", 1000000,
                 0, 400000, 399000, 400000, 60, "tp:A:P"),
        _paf_row("ctg2", 400000, 0, 400000, "+", "chr1", 1000000,
                 500000, 900000, 399000, 400000, 60, "tp:A:P"),
    ]
    paf.write_text("\n".join(rows) + "\n")
    out, _ = run(["asmstat", str(fai), str(paf)])
    lines = out.splitlines()
    assert lines[0].split("\t")[0] == "Metric"
    d = {l.split("\t")[0]: l.split("\t")[1] for l in lines[1:]}
    assert d["Length"] == "800000"
    assert d["l_cov"] == "800000"
    assert d["Rcov"] == "80.00%"
    assert d["Rdup"] == "0.00%"
    assert d["Qcov"] == "100.00%"
    assert d["NG50"] == "400000"
    assert d["NGA50"] == "400000"
    assert d["#breaks"] == "0"


def test_asmstat_breaks_and_dup(tmp_path):
    fai = tmp_path / "ref.fa.fai"
    fai.write_text("chr1\t1000000\t6\t80\t81\n")
    paf = tmp_path / "asm.paf"
    # one contig split into two alignments (1 break), overlapping on ref
    rows = [
        _paf_row("ctg1", 500000, 0, 200000, "+", "chr1", 1000000,
                 0, 200000, 199000, 200000, 60, "tp:A:P"),
        _paf_row("ctg1", 500000, 200000, 500000, "+", "chr1", 1000000,
                 150000, 450000, 299000, 300000, 60, "tp:A:P"),
    ]
    paf.write_text("\n".join(rows) + "\n")
    out, _ = run(["asmstat", str(fai), str(paf)])
    d = {l.split("\t")[0]: l.split("\t")[1] for l in out.splitlines()[1:]}
    assert d["#breaks"] == "1"
    # ref coverage [0,450k); [150k,200k) is covered twice
    assert d["l_cov"] == "450000"
    assert d["Rdup"] == "11.11%"  # 50k / 450k


def test_asmgene(tmp_path):
    # ref mapping: g1 and g2 full-length single copy; asm misses g2
    ref = tmp_path / "ref.paf"
    ref.write_text("\n".join([
        _paf_row("g1", 1000, 0, 1000, "+", "chr1", 99000, 1000, 2000,
                 1000, 1000, 60),
        _paf_row("g2", 2000, 0, 2000, "+", "chr1", 99000, 5000, 7000,
                 2000, 2000, 60),
    ]) + "\n")
    asm = tmp_path / "asm.paf"
    asm.write_text("\n".join([
        _paf_row("g1", 1000, 0, 1000, "+", "ctg1", 50000, 100, 1100,
                 1000, 1000, 60),
        # g2 fragmented: only half covered
        _paf_row("g2", 2000, 0, 1000, "+", "ctg1", 50000, 2000, 3000,
                 1000, 1000, 60),
    ]) + "\n")
    out, _ = run(["asmgene", str(ref), str(asm)])
    lines = [l.split("\t") for l in out.splitlines()]
    assert lines[0][:2] == ["H", "Metric"]
    d = {l[1]: l[2:] for l in lines[1:]}
    assert d["full_sgl"] == ["2", "1"]   # ref: both; asm: only g1
    assert d["part50+"] == ["0", "1"]    # g2 at 50% coverage


def test_misjoin(tmp_path):
    paf = tmp_path / "asm.paf"
    rows = [
        # ctg1: two segments on different chromosomes -> 1 inter-chrom
        _paf_row("ctg1", 5000000, 0, 2000000, "+", "chr1", 9000000,
                 0, 2000000, 0, 2000000, 60),
        _paf_row("ctg1", 5000000, 2000000, 4000000, "+", "chr2", 9000000,
                 0, 2000000, 0, 2000000, 60),
        # ctg2: same chr, same strand, 2M ref gap vs 0 query gap
        _paf_row("ctg2", 5000000, 0, 2000000, "+", "chr3", 9000000,
                 0, 2000000, 0, 2000000, 60),
        _paf_row("ctg2", 5000000, 2000000, 4000000, "+", "chr3", 9000000,
                 4000000, 6000000, 0, 2000000, 60),
    ]
    paf.write_text("\n".join(rows) + "\n")
    out, _ = run(["misjoin", str(paf)])
    assert "# inter-chromosomal misjoins: 1,0" in out
    assert "# intra-chromosomal gaps: 1,0" in out


def test_misjoin_centromere(tmp_path):
    cen = tmp_path / "cen.bed"
    cen.write_text("chr1\t0\t3000000\n")
    paf = tmp_path / "asm.paf"
    rows = [
        _paf_row("ctg1", 5000000, 0, 2000000, "+", "chr1", 9000000,
                 0, 2000000, 0, 2000000, 60),
        _paf_row("ctg1", 5000000, 2000000, 4000000, "+", "chr2", 9000000,
                 0, 2000000, 0, 2000000, 60),
    ]
    paf.write_text("\n".join(rows) + "\n")
    out, _ = run(["misjoin", "-c", str(cen), str(paf)])
    # first segment is >=50% centromeric -> counted in the 2nd column too
    assert "# inter-chromosomal misjoins: 1,1" in out


VCF_PAIR = """\
##fileformat=VCFv4.1
##contig=<ID=chr1,length=1000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\thap1\thap2
chr1\t100\t.\tA\tG\t.\t.\t.\tGT:AD\t1/1:0,5\t1/1:0,7
chr1\t200\t.\tC\tT\t.\t.\t.\tGT:AD\t0/1:3,4\t1/1:0,6
chr1\t300\t.\tG\tA\t.\t.\t.\tGT:AD\t./.:0,0\t1/1:0,8
"""


def test_vcfpair(tmp_path):
    vcf = tmp_path / "pair.vcf"
    vcf.write_text(VCF_PAIR)
    out, _ = run(["vcfpair", "-s", "mix", str(vcf)])
    lines = out.splitlines()
    assert any(l.startswith("##FILTER=<ID=HET1") for l in lines)
    rows = [l.split("\t") for l in lines if l.startswith("chr1")]
    # hom/hom merged to 1|1 with summed AD, PASS
    assert rows[0][6] == "." and rows[0][9] == "1|1:0,12"
    # het in hap1
    assert rows[1][6] == "HET1" and rows[1][9] == ".|1:3,10"
    # gap in hap1
    assert rows[2][6] == "GAP1" and rows[2][9] == ".|1:0,8"
    hdr = [l for l in lines if l.startswith("#CHROM")][0].split("\t")
    assert hdr[-1] == "mix"


def _sv_vcf(path, entries):
    lines = ["##fileformat=VCFv4.1",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for chrom, pos, ref, alt in entries:
        lines.append(f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t30\tPASS\t.")
    path.write_text("\n".join(lines) + "\n")


def test_sveval(tmp_path):
    base = tmp_path / "base.vcf"
    call = tmp_path / "call.vcf"
    ins100 = "A" + "G" * 100
    # base has 2 SVs; call finds the first (within window) plus a false one
    _sv_vcf(base, [("chr1", 1000, "A", ins100),
                   ("chr1", 50000, "T" + "C" * 80, "T")])
    _sv_vcf(call, [("chr1", 1100, "A", ins100),
                   ("chr1", 90000, "A", ins100)])
    out, _ = run(["sveval", str(base), str(call)])
    lines = [l.split("\t") for l in out.splitlines()]
    d = {l[0]: l[1:] for l in lines}
    assert d["SN"][:2] == ["2", "1"]     # 2 true SVs, 1 found
    assert d["PC"][:2] == ["2", "1"]     # 2 calls, 1 correct
    assert d["F1"] == ["0.500000"]


def test_help_lists_asm_commands():
    out, _ = run([], expect_rc=1)
    for cmd in ("asmstat", "asmgene", "misjoin", "vcfpair", "sveval"):
        assert cmd in out
