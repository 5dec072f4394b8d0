"""End-to-end PAF byte-parity vs the reference binary's golden outputs."""
import io as _io
import sys
from contextlib import redirect_stdout

import pytest

from mm2tpu.cli import main as cli_main

T = "/root/reference/test"


def run_cli(args):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args.split())
    assert rc == 0
    return buf.getvalue()


CASES = [
    ("mapont_MT.paf", f"-x map-ont {T}/MT-orang.fa {T}/MT-human.fa"),
    ("mappb_MT.paf", f"-x map-pb {T}/MT-orang.fa {T}/MT-human.fa"),
    ("asm5_MT.paf", f"-x asm5 {T}/MT-orang.fa {T}/MT-human.fa"),
    ("asm20_MT.paf", f"-x asm20 {T}/MT-orang.fa {T}/MT-human.fa"),
    ("default_MT.paf", f"{T}/MT-orang.fa {T}/MT-human.fa"),
]


@pytest.mark.parametrize("golden,args", CASES, ids=[c[0] for c in CASES])
def test_paf_parity(golden_dir, ref_test_dir, golden, args):
    out = run_cli("--chain-backend python " + args)
    expected = (golden_dir / golden).read_text()
    assert out == expected


def test_paf_parity_ava(golden_dir, ref_test_dir, tmp_path):
    reads = tmp_path / "ava_reads.fa"
    reads.write_text((ref_test_dir / "MT-human.fa").read_text() +
                     (ref_test_dir / "MT-orang.fa").read_text())
    out = run_cli(f"--chain-backend python -x ava-ont {reads} {reads}")
    assert out == (golden_dir / "avaont_MT.paf").read_text()


def test_mmi_index_input(golden_dir, ref_test_dir):
    """Mapping against the reference's own .mmi binary index."""
    out = run_cli(f"--chain-backend python -x map-ont "
                  f"{golden_dir}/mapont_MTorang.mmi {T}/MT-human.fa")
    assert out == (golden_dir / "mapont_MT.paf").read_text()


def test_threaded_pipeline_parity(ref_test_dir, tmp_path):
    """-t N must produce byte-identical, in-order output (kt_pipeline's
    ordered-delivery invariant, kthread.c:97-128)."""
    seq = "".join(l.strip() for l in
                  (ref_test_dir / "MT-human.fa").read_text().splitlines()[1:])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(40):
            st = (i * 397) % (len(seq) - 2200)
            f.write(f">r{i}\n{seq[st:st + 2000]}\n")
    args = f"--chain-backend python -x map-ont {ref_test_dir}/MT-orang.fa {reads}"
    single = run_cli("-t 1 " + args)
    multi = run_cli("-t 4 " + args)
    assert single == multi
    assert [l.split("\t")[0] for l in single.splitlines()] \
        == sorted([f"r{i}" for i in range(40)], key=lambda s: int(s[1:]))


def test_batch_mode_parity(ref_test_dir, tmp_path):
    """--map-mode batch (bucketed device chaining, one dispatch per
    bucket) must be byte-identical to streaming with the same kernel."""
    seq = "".join(l.strip() for l in
                  (ref_test_dir / "MT-human.fa").read_text().splitlines()[1:])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(10):
            st = (i * 1103) % (len(seq) - 2200)
            f.write(f">r{i}\n{seq[st:st + 2000]}\n")
    args = f"-x map-ont {ref_test_dir}/MT-orang.fa {reads}"
    stream = run_cli("--chain-backend tpu " + args)
    batch = run_cli("--map-mode batch " + args)
    assert stream == batch
    assert len(batch.splitlines()) >= 10


def test_mesh_sharded_mapping_parity(ref_test_dir, tmp_path):
    """--mesh 8: batched chaining sharded over the 8-device virtual mesh
    must produce byte-identical, in-order output (data parallelism over
    reads with a replicated index, SURVEY §2.3)."""
    seq = "".join(l.strip() for l in
                  (ref_test_dir / "MT-human.fa").read_text().splitlines()[1:])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(16):
            st = (i * 997) % (len(seq) - 2200)
            f.write(f">r{i}\n{seq[st:st + 2000]}\n")
    args = f"-x map-ont {ref_test_dir}/MT-orang.fa {reads}"
    serial = run_cli("--chain-backend tpu " + args)
    sharded = run_cli("--mesh 8 " + args)
    assert serial == sharded
    assert len(sharded.splitlines()) >= 16
