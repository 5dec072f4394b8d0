"""Statistical accuracy evaluation (SURVEY §4 item 5): simulate error-prone
reads with pbsim-style names, map them with the CLI, and check the
paftools-mapeval ROC — the reference's misc/paftools.js mapeval workflow
(tex/hs38-simu.sh) run end-to-end against our own mapper."""
import io as _io
from contextlib import redirect_stdout

import numpy as np
import pytest

from mm2tpu.cli import main as cli_main
from mm2tpu.tools.paftools import main as pt_main

T = "/root/reference/test"
BASES = np.frombuffer(b"ACGT", np.uint8)


def _load_ref():
    lines = open(f"{T}/MT-orang.fa").read().splitlines()
    return lines[0][1:].split()[0], "".join(lines[1:])


def _mutate(rng, read: str, sub_rate=0.05, indel_rate=0.02) -> str:
    arr = np.frombuffer(read.encode(), np.uint8).copy()
    out = []
    for ch in arr:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(BASES[rng.integers(4)])  # insertion
        if rng.random() < sub_rate:
            out.append(BASES[(np.searchsorted(BASES, ch) +
                              rng.integers(1, 4)) % 4])
        else:
            out.append(ch)
    return bytes(bytearray(int(b) for b in out)).decode()


RC = str.maketrans("ACGT", "TGCA")


@pytest.fixture(scope="module")
def sim_paf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mapeval")
    name, ref = _load_ref()
    rng = np.random.default_rng(7)
    reads = tmp / "sim.fa"
    n_reads, rlen = 60, 1500
    with open(reads, "w") as f:
        for i in range(n_reads):
            st = int(rng.integers(0, len(ref) - rlen))
            seq = _mutate(rng, ref[st:st + rlen])
            strand = "+-"[int(rng.integers(2))]
            if strand == "-":
                seq = seq.translate(RC)[::-1]
            # pbsim naming: read!chr!st!en!strand (paftools.js:2043)
            f.write(f">S1_{i}!{name}!{st}!{st + rlen}!{strand}\n{seq}\n")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(f"-x map-ont {T}/MT-orang.fa {reads}".split())
    assert rc == 0
    paf = tmp / "out.paf"
    paf.write_text(buf.getvalue())
    return paf, n_reads


def test_mapeval_roc_accuracy(sim_paf):
    paf, n_reads = sim_paf
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = pt_main(["mapeval", str(paf)])
    assert rc == 0
    rows = [l.split("\t") for l in buf.getvalue().splitlines()
            if l.startswith("Q")]
    assert rows, "no reads evaluated"
    total = sum(int(r[2]) for r in rows)
    cum_err_frac = float(rows[-1][4])
    assert total >= n_reads * 0.95          # nearly all reads mapped
    assert cum_err_frac <= 0.02             # MT is tiny; mapping is easy
    # top quality band must be error-free on this input
    assert int(rows[0][1]) == 60 and int(rows[0][3]) == 0


def test_mapeval_catches_shuffled_truth(sim_paf):
    """Negative control: corrupting the truth coordinates must show up as
    errors — guards against mapeval vacuously passing."""
    paf, _ = sim_paf
    lines = paf.read_text().splitlines()
    bad = []
    for l in lines:
        t = l.split("\t")
        parts = t[0].split("!")
        parts[2] = str(int(parts[2]) + 8000)  # shift truth start
        parts[3] = str(int(parts[3]) + 8000)
        t[0] = "!".join(parts)
        bad.append("\t".join(t))
    p2 = paf.parent / "bad.paf"
    p2.write_text("\n".join(bad) + "\n")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        pt_main(["mapeval", str(p2)])
    rows = [l.split("\t") for l in buf.getvalue().splitlines()
            if l.startswith("Q")]
    assert sum(int(r[3]) for r in rows) > 0
