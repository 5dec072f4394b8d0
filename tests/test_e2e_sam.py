"""End-to-end SAM/CIGAR byte-parity vs the reference binary's goldens.
(@PG header line is excluded: it embeds the exact command string.)"""
import io as _io
from contextlib import redirect_stdout

import pytest

from mm2tpu.cli import main as cli_main

T = "/root/reference/test"


def run_cli(args):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args.split())
    assert rc == 0
    return "\n".join(l for l in buf.getvalue().splitlines()
                     if not l.startswith("@PG"))


def load(golden_dir, name):
    return "\n".join(l for l in (golden_dir / name).read_text().splitlines()
                     if not l.startswith("@PG"))


CASES = [
    ("q2t2_a.sam", f"-a {T}/t2.fa {T}/q2.fa"),
    ("q2t2_k10.paf", f"-c -k10 -w3 -m10 -n1 -s10 {T}/t2.fa {T}/q2.fa"),
    ("mapont_MT_a.sam", f"-x map-ont -a {T}/MT-orang.fa {T}/MT-human.fa"),
    ("mapont_MT_c.paf", f"-x map-ont -c {T}/MT-orang.fa {T}/MT-human.fa"),
    ("mapont_MT_cs.paf", f"-x map-ont -c --cs {T}/MT-orang.fa {T}/MT-human.fa"),
    ("mapont_MT_md.sam", f"-x map-ont -a --MD {T}/MT-orang.fa {T}/MT-human.fa"),
    ("mapont_MT_eqx.sam", f"-x map-ont -a --eqx {T}/MT-orang.fa {T}/MT-human.fa"),
    ("asm20_MT_c.paf", f"-x asm20 -c {T}/MT-orang.fa {T}/MT-human.fa"),
    ("qinv_a.sam", f"-a {T}/t-inv.fa {T}/q-inv.fa"),
    ("qinv_cs.paf", f"-c --cs {T}/t-inv.fa {T}/q-inv.fa"),
    ("q2t2_splice.paf",
     f"-x splice -c --cs -k10 -w3 -m10 -n1 -s10 {T}/t2.fa {T}/q2.fa"),
    ("q2t2_splice_a.sam",
     f"-x splice -a -k10 -w3 -m10 -n1 -s10 {T}/t2.fa {T}/q2.fa"),
    ("q2t2_splice_junc.paf",
     "-x splice -c --cs -k10 -w3 -m10 -n1 -s10 "
     f"--junc-bed tests/golden/t2_junc.bed {T}/t2.fa {T}/q2.fa"),
    ("sr_pe_MT.paf", f"-x sr {T}/MT-orang.fa "
     "tests/golden/sr_reads_1.fq tests/golden/sr_reads_2.fq"),
    ("sr_pe_MT.sam", f"-x sr -a {T}/MT-orang.fa "
     "tests/golden/sr_reads_1.fq tests/golden/sr_reads_2.fq"),
    ("sr_se_MT.paf", f"-x sr {T}/MT-orang.fa tests/golden/sr_reads_1.fq"),
    # multi-part prebuilt index: per-part emission, and --split-prefix
    # merge with cross-part primary/secondary re-selection
    ("twopart_nosplit.paf", "tests/golden/twopart_MT.mmi "
     f"tests/golden/sr_reads_1.fq {T}/MT-human.fa"),
    ("twopart_split.paf", "--split-prefix /tmp/mm2tpu_sp_test "
     "tests/golden/twopart_MT.mmi tests/golden/sr_reads_1.fq"),
    ("twopart_split.sam", "-a --split-prefix /tmp/mm2tpu_sp_test "
     "tests/golden/twopart_MT.mmi tests/golden/sr_reads_1.fq"),
    ("twopart_split_c.paf", "-c --split-prefix /tmp/mm2tpu_sp_test "
     f"tests/golden/twopart_MT.mmi {T}/MT-human.fa"),
]


@pytest.mark.parametrize("golden,args", CASES, ids=[c[0] for c in CASES])
def test_sam_cigar_parity(golden_dir, ref_test_dir, golden, args):
    out = run_cli("--chain-backend native " + args)
    assert out == load(golden_dir, golden)


def test_align_backend_tpu_parity(golden_dir, ref_test_dir):
    """--align-backend tpu (Pallas extd2 for large fills) must be
    byte-identical; the MT read's main fills exceed the 1M-cell gate."""
    out = run_cli(f"--align-backend tpu -x map-ont -a "
                  f"{ref_test_dir}/MT-orang.fa {ref_test_dir}/MT-human.fa")
    got = [l for l in out.splitlines() if not l.startswith("@PG")]
    want = [l for l in (golden_dir / "mapont_MT_a.sam").read_text()
            .splitlines() if not l.startswith("@PG")]
    assert got == want


def test_align_backend_tpu_splice_parity(golden_dir, ref_test_dir, tmp_path):
    """--align-backend tpu with the splice preset (Pallas exts2 kernel;
    gate lowered to 0 so the tiny fixture's fills route to the kernel)."""
    out = run_cli(f"--align-backend tpu --align-tpu-min-mat 0 "
                  f"-x splice -a -k10 -w3 -m10 -n1 -s10 "
                  f"{ref_test_dir}/t2.fa {ref_test_dir}/q2.fa")
    got = [l for l in out.splitlines() if not l.startswith("@PG")]
    want = [l for l in (golden_dir / "q2t2_splice_a.sam").read_text()
            .splitlines() if not l.startswith("@PG")]
    assert got == want
