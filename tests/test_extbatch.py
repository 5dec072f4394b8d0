"""Cross-read batched device extension (mapping/extbatch.py): fills from
concurrently-aligned reads coalesce into one extd2_batch dispatch, output
byte-identical to the host path (the DMA-batching analogue of reference
chain_hardware.cpp:104-189)."""
import io as _io
from contextlib import redirect_stdout

import numpy as np

from mm2tpu.cli import main as cli_main

T = "/root/reference/test"


def _run(args):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args.split())
    assert rc == 0
    return "\n".join(l for l in buf.getvalue().splitlines()
                     if not l.startswith("@PG"))


def test_batched_extension_parity_q2t2():
    host = _run(f"-a {T}/t2.fa {T}/q2.fa")
    dev = _run(f"-a --map-mode batch --align-backend tpu "
               f"--align-tpu-min-mat 1 {T}/t2.fa {T}/q2.fa")
    assert dev == host


def test_batched_extension_parity_multi_read(tmp_path):
    """Many small reads so several align1 workers coalesce their fills."""
    seq = "".join(l.strip() for l in
                  open(f"{T}/MT-human.fa").read().splitlines()[1:])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(12):
            st = (i * 631) % (len(seq) - 700)
            f.write(f">r{i}\n{seq[st:st + 600]}\n")
    host = _run(f"-a -t 1 {T}/MT-orang.fa {reads}")
    dev = _run(f"-a --map-mode batch --align-backend tpu "
               f"--align-tpu-min-mat 1 {T}/MT-orang.fa {reads}")
    assert dev == host


def test_batcher_groups_and_flushes():
    """Unit: N workers' submits produce >=1 grouped dispatch, correct
    per-task results (vs the native/oracle path)."""
    from concurrent.futures import ThreadPoolExecutor

    from mm2tpu.mapping.extbatch import ExtBatcher, worker_scope
    from mm2tpu.ops import ksw2_ref as K

    mat = np.asarray(K.gen_simple_mat(2, 4, 1), np.int8)
    rng = np.random.default_rng(0)
    tasks = []
    for i in range(6):
        t8 = rng.integers(0, 4, 80 + 10 * i).astype(np.uint8)
        q8 = t8.copy()
        q8[::7] = (q8[::7] + 1) % 4
        tasks.append((q8, t8))

    bat = ExtBatcher(max_batch=8, min_cells=0, interpret=True)

    def run_one(task):
        q8, t8 = task
        with worker_scope(bat):
            return bat.submit(q8, t8, mat, 4, 2, 24, 1, 151, 400, -1, 0)

    with ThreadPoolExecutor(6) as ex:
        results = list(ex.map(run_one, tasks))

    assert bat.n_batched == len(tasks)
    assert bat.n_dispatches <= len(tasks)
    for (q8, t8), rz in zip(tasks, results):
        exp = K.ksw_extd2(len(q8), q8, len(t8), t8, mat, 4, 2, 24, 1,
                          151, 400, -1, 0)
        assert rz.score == exp.score and rz.cigar == exp.cigar
