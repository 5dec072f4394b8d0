"""Randomized large-scale differential test vs the reference binary.

Beyond the fixed MT fixtures: a seeded multi-contig random genome with
repeat insertions and error-laden reads, mapped by BOTH the reference fork
(compiled software-only, /tmp/golden/minimap2-golden — scripts/
make_golden.sh) and mm2tpu, byte-diffed. Exercises multi-contig rid
handling, repeats (rep_len/mapq), both strands and several presets on
input neither implementation has ever seen.

Skipped when the reference binary is absent.
"""
import io as _io
import os
import subprocess
from contextlib import redirect_stdout

import numpy as np
import pytest

from mm2tpu.cli import main as cli_main

GOLDEN_BIN = "/tmp/golden/minimap2-golden"

if not os.path.exists(GOLDEN_BIN) and os.path.exists("/root/reference"):
    # one-shot auto-build (software-only reference; ~30 s)
    subprocess.run(
        ["bash", os.path.join(os.path.dirname(__file__), "..", "scripts",
                              "build_golden_bin.sh")],
        capture_output=True, timeout=300)

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_BIN),
    reason="reference binary not built (scripts/build_golden_bin.sh)")

RC = str.maketrans("ACGT", "TGCA")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("randg")
    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))

    def rand_seq(n):
        return "".join(bases[rng.integers(0, 4, n)])

    core = rand_seq(120000)
    rep = rand_seq(4000)
    ctgs = {
        "ctg1": core[:60000] + rep + core[60000:100000] + rep + core[100000:],
        "ctg2": rand_seq(150000) + rep,
        "ctg3": rand_seq(80000),
    }
    ref = tmp / "ref.fa"
    with open(ref, "w") as f:
        for name, s in ctgs.items():
            f.write(f">{name}\n")
            for j in range(0, len(s), 80):
                f.write(s[j:j + 80] + "\n")

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.04:
                out.append("ACGT"[rng.integers(4)])
            if rng.random() < 0.06:
                out.append("ACGT"[rng.integers(4)])
            out.append(ch)
        return "".join(out)

    names = list(ctgs)
    reads = tmp / "reads.fa"
    with open(reads, "w") as f:
        for i in range(50):
            ctg = names[int(rng.integers(3))]
            L = int(rng.integers(800, 6000))
            st = int(rng.integers(0, len(ctgs[ctg]) - L))
            s = mutate(ctgs[ctg][st:st + L])
            if rng.random() < 0.5:
                s = s.translate(RC)[::-1]
            f.write(f">rd{i}\n{s}\n")
    # a short subset for the (slower) SAM alignment case
    sam_reads = tmp / "sam_reads.fa"
    lines = reads.read_text().splitlines()
    sam_reads.write_text("\n".join(lines[:20]) + "\n")
    return ref, reads, sam_reads


def ref_out(args):
    r = subprocess.run([GOLDEN_BIN] + args, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    return "\n".join(l for l in r.stdout.splitlines()
                     if not l.startswith("@PG"))


def my_out(args):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args)
    assert rc == 0
    return "\n".join(l for l in buf.getvalue().splitlines()
                     if not l.startswith("@PG"))


@pytest.mark.parametrize("preset,cigar", [("map-ont", True),
                                          ("map-pb", True),
                                          ("asm20", False)])
def test_random_genome_paf(dataset, preset, cigar):
    ref, reads, _ = dataset
    args = ["-x", preset] + (["-c"] if cigar else []) + [str(ref),
                                                         str(reads)]
    assert my_out(args) == ref_out(args)


def test_random_genome_paf_threaded(dataset):
    """The threaded pipeline must reproduce the reference output on the
    random genome (batch-mode parity is covered on the MT fixtures, where
    interpret-mode chaining is affordable)."""
    ref, reads, _ = dataset
    args = ["-x", "map-ont", "-c", str(ref), str(reads)]
    assert my_out(["-t", "4"] + args) == ref_out(args)


def test_random_genome_sam(dataset):
    ref, _, sam_reads = dataset
    args = ["-x", "map-ont", "-a", str(ref), str(sam_reads)]
    assert my_out(args) == ref_out(args)


def test_random_genome_sr_paired(dataset, tmp_path):
    """Paired-end short reads on the random genome (pe.c pairing model,
    sr preset) vs the reference binary."""
    ref, _, _ = dataset
    rng = np.random.default_rng(7)
    ctgs = {}
    name = None
    for line in open(ref):
        if line.startswith(">"):
            name = line[1:].strip()
            ctgs[name] = []
        else:
            ctgs[name].append(line.strip())
    ctgs = {k: "".join(v) for k, v in ctgs.items()}
    names = list(ctgs)
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(120):
            ctg = names[int(rng.integers(3))]
            frag = int(rng.integers(250, 600))
            st = int(rng.integers(0, len(ctgs[ctg]) - frag))
            seq = ctgs[ctg][st:st + frag]
            a, b = seq[:100], seq[-100:].translate(RC)[::-1]
            def noise(s):
                return "".join("ACGT"[rng.integers(4)]
                               if rng.random() < 0.005 else c for c in s)
            f1.write(f"@p{i}\n{noise(a)}\n+\n{'I' * 100}\n")
            f2.write(f"@p{i}\n{noise(b)}\n+\n{'I' * 100}\n")
    for extra in ([], ["-a"]):
        args = ["-x", "sr"] + extra + [str(ref), str(r1), str(r2)]
        assert my_out(args) == ref_out(args), extra


def test_random_genome_splice(dataset, tmp_path):
    """cDNA reads against a genome with GT..AG introns (splice preset,
    exts2 model) vs the reference binary."""
    ref, _, _ = dataset
    rng = np.random.default_rng(9)
    ctgs = {}
    name = None
    for line in open(ref):
        if line.startswith(">"):
            name = line[1:].strip()
            ctgs[name] = []
        else:
            ctgs[name].append(line.strip())
    ctgs = {k: "".join(v) for k, v in ctgs.items()}
    reads = tmp_path / "cdna.fa"
    with open(reads, "w") as f:
        for i in range(8):
            g = ctgs["ctg2"]
            st = int(rng.integers(0, len(g) - 10000))
            exons = []
            pos = st
            for _ in range(int(rng.integers(2, 4))):
                elen = int(rng.integers(120, 300))
                exons.append(g[pos:pos + elen])
                pos += elen + int(rng.integers(150, 700))
            seq = "".join(exons)
            if rng.random() < 0.5:
                seq = seq.translate(RC)[::-1]
            f.write(f">cd{i}\n{seq}\n")
    # -G caps the intron length (and with it the unbanded exts2 fill
    # size); real long-intron fills belong on the device kernel, not in
    # the CPU test suite
    for extra in ([], ["-C", "5"], ["-u", "f"]):
        args = (["-x", "splice", "-G", "2k", "-a"] + extra
                + [str(ref), str(reads)])
        assert my_out(args) == ref_out(args), extra


OPTION_SWEEP = [
    ["-x", "map-ont", "-a", "--eqx"],
    ["-x", "map-ont", "-a", "--MD"],
    ["-x", "map-ont", "-c", "--cs"],
    ["-x", "map-ont", "-c", "--cs=long"],
    ["-x", "map-ont", "-H", "-c"],          # HPC k-mers
    ["-x", "map-ont", "-c", "-N", "10", "-p", "0.5"],
    ["-x", "map-ont", "-c", "--secondary", "no"],
    ["-x", "map-ont", "-a", "-Y"],          # soft-clip supplementary
    ["-k", "17", "-w", "7", "-c"],          # non-preset k/w
    ["-x", "map-ont", "-c", "--heap-sort", "yes"],  # heap-merge seeding
    ["-x", "map-ont", "-c", "--for-only"],
    ["-x", "map-ont", "-c", "-r", "100"],   # narrow band
    ["-x", "map-ont", "-a", "-z", "200,100"],  # split zdrop/zdrop_inv
    ["-x", "map-ont", "-c", "-K", "60k"],   # small mapping mini-batch
    ["-x", "map-ont", "-c", "-T", "20"],    # sdust low-complexity mask
    ["-x", "map-ont", "-a", "--end-bonus", "10"],
    ["-x", "map-ont", "-a", "--score-N", "1"],
    ["-x", "map-ont", "-c", "--no-long-join"],
    ["-x", "map-ont", "-a", "--sam-hit-only"],
    ["-x", "map-ont", "-c", "--mask-level", "0.2"],
    ["-x", "map-ont", "-a", "--no-end-flt"],
    ["-x", "map-ont", "-c", "--min-occ-floor", "50"],
    ["-x", "map-ont", "-c", "--mask-level", "0.2"],
    ["-x", "map-ont", "-c", "-D"],
    ["-x", "map-ont", "-c", "-P"],
    ["-x", "map-ont", "-c", "--lj-min-ratio", "0.7"],
    ["-x", "map-ont", "-a", "--end-seed-pen", "10"],
    ["-x", "map-ont", "-c", "--max-clip-ratio", "0.5"],
    ["-x", "map-ont", "-a", "-L"],
    ["-x", "map-ont", "-c", "-g", "2000"],
    ["-x", "map-ont", "-c", "--max-qlen", "5000"],
    ["-x", "map-ont", "-k", "28", "-w", "20", "-c"],  # max k
    ["-x", "map-ont", "-A", "2", "-B", "6", "-O", "8,40", "-E", "3,2",
     "-a"],                                           # custom dual-gap scoring
    ["-x", "map-ont", "-a", "-O", "20", "-E", "8"],   # single-value -O/-E
    ["-x", "map-pb", "-a"],        # HPC index + mm_adjust_minier path
    ["-x", "map-pb", "-a", "--eqx"],
    ["-x", "asm5", "-a"],
]


@pytest.mark.parametrize("extra", OPTION_SWEEP,
                         ids=[" ".join(e) for e in OPTION_SWEEP])
def test_random_genome_option_sweep(dataset, extra):
    """Option surface hardening: tag emitters, HPC sketching, secondary
    controls and custom k/w must all match the reference byte-for-byte
    on the random genome."""
    ref, _, sam_reads = dataset
    args = extra + [str(ref), str(sam_reads)]
    assert my_out(args) == ref_out(args)


def test_random_genome_ava(dataset, tmp_path):
    """ava-ont all-vs-all overlapping of the simulated reads."""
    _, reads, _ = dataset
    args = ["-x", "ava-ont", str(reads), str(reads)]
    assert my_out(args) == ref_out(args)


def test_random_genome_junc_bed(dataset, tmp_path):
    """--junc-bed annotated junctions on the random genome (BED reader,
    per-base donor/acceptor flags through the exts2 model) vs the
    reference binary."""
    ref, _, _ = dataset
    rng = np.random.default_rng(21)
    ctgs = {}
    name = None
    for line in open(ref):
        if line.startswith(">"):
            name = line[1:].strip()
            ctgs[name] = []
        else:
            ctgs[name].append(line.strip())
    ctgs = {k: "".join(v) for k, v in ctgs.items()}
    g = ctgs["ctg3"]
    reads = tmp_path / "cdna_j.fa"
    bed = tmp_path / "junc.bed"
    bed_rows = []
    with open(reads, "w") as f:
        for i in range(6):
            st = int(rng.integers(0, len(g) - 8000))
            exons = []
            pos = st
            for _ in range(3):
                elen = int(rng.integers(120, 250))
                exons.append(g[pos:pos + elen])
                iv = int(rng.integers(200, 600))
                bed_rows.append(("ctg3", pos + elen, pos + elen + iv, "+"))
                pos += elen + iv
            f.write(f">j{i}\n{''.join(exons)}\n")
    with open(bed, "w") as f:
        for c, s, e, strand in bed_rows:
            f.write(f"{c}\t{s}\t{e}\tj\t0\t{strand}\n")
    args = ["-x", "splice", "-G", "2k", "-a",
            "--junc-bed", str(bed), str(ref), str(reads)]
    assert my_out(args) == ref_out(args)


def test_random_genome_alt(dataset, tmp_path):
    """--alt contig handling (ALT marking, alt_drop re-ranking, SAM flag
    demotion) vs the reference binary."""
    ref, reads, _ = dataset
    alt = tmp_path / "alts.txt"
    alt.write_text("ctg2\n")
    for extra in (["-c"], ["-a"]):
        args = ["-x", "map-ont", "--alt", str(alt)] + extra + [str(ref),
                                                               str(reads)]
        assert my_out(args) == ref_out(args), extra


@pytest.mark.parametrize("args", [
    ["-x", "asm10", "-c"],
    ["-x", "ava-pb"],            # HPC sketch + ava seed rules
    ["-x", "splice:hq", "-G", "2k", "-c"],
], ids=["asm10", "ava-pb", "splice_hq"])
def test_random_genome_more_presets(dataset, args):
    """Presets without dedicated fixtures (asm10, ava-pb, splice:hq)
    byte-diffed against the reference binary."""
    ref, reads, _ = dataset
    if args[1] == "ava-pb":
        full = args + [str(reads), str(reads)]
    else:
        full = args + [str(ref), str(reads)]
    assert my_out(full) == ref_out(full)


def test_random_genome_multipart_split(dataset, tmp_path):
    """-I forced multi-part index + --split-prefix merge on the random
    genome (rid renumbering, re-select/re-mapq across parts) vs the
    reference binary."""
    ref, reads, _ = dataset
    # append a read over ctg1's repeat insert so rep_len > 0 exercises the
    # merge's rl:i semantics (the reference emits rl:i:0 in merged output)
    ctg1 = []
    grab = False
    for line in open(ref):
        if line.startswith(">"):
            grab = line[1:].strip() == "ctg1"
        elif grab:
            ctg1.append(line.strip())
    ctg1 = "".join(ctg1)
    reads2 = tmp_path / "reads_rep.fa"
    reads2.write_text(open(reads).read()
                      + f">rep_read\n{ctg1[58000:66000]}\n")
    for extra in ([], ["--split-prefix", str(tmp_path / "sp")]):
        args = (["-x", "map-ont", "-c", "-I", "200k"] + extra
                + [str(ref), str(reads2)])
        assert my_out(args) == ref_out(args), extra


def test_random_genome_edge_reads(dataset, tmp_path):
    """Adversarial inputs (empty record, 1bp, all-N, lowercase, tiny,
    empty file, --paf-no-hit, CRLF fastq) byte-diffed vs the reference."""
    ref, _, _ = dataset
    edge = tmp_path / "edge.fa"
    edge.write_text(
        ">empty\n\n>onebp\nA\n>allN\n" + "N" * 48 + "\n"
        ">lowercase\nacgtacgtacgtnacgtacgtACGTacgtacgtacgtacgtacgtacgt\n"
        ">short\nACGTACGT\n")
    for extra in (["-c"], ["-a"], ["-c", "--paf-no-hit"]):
        args = ["-x", "map-ont"] + extra + [str(ref), str(edge)]
        assert my_out(args) == ref_out(args), extra
    empty = tmp_path / "none.fa"
    empty.write_text("")
    args = ["-x", "map-ont", "-c", str(ref), str(empty)]
    assert my_out(args) == ref_out(args)
    # -Q qual suppression, -R read-group line + per-record RG:Z tags
    qfq = tmp_path / "q.fq"
    qfq.write_text("@q1\n" + "ACGT" * 20 + "\n+\n" + "I" * 80 + "\n")
    for extra in (["-Q"], ["-R", "@RG\\tID:x\\tSM:s"],
                  ["-Q", "-R", "@RG\\tID:y"]):
        args = ["-x", "sr", "-a"] + extra + [str(ref), str(qfq)]
        assert my_out(args) == ref_out(args), extra
    crlf = tmp_path / "crlf.fq"
    crlf.write_text("@r1 c\r\nACGTACGTACGTACGTACGTACGTACGTACGT\r\n+\r\n"
                    + "I" * 32 + "\r\n")
    args = ["-x", "sr", "-c", str(ref), str(crlf)]
    assert my_out(args) == ref_out(args)
