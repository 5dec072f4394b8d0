"""Stage-level differential test against the reference --print-seeds dump.

The golden .seeds file has, per read:
  RS <rep_len>
  SD <tname> <tpos> <strand> <qpos> <span> <gap>   (sorted anchors, pre-chain)
  CN <chain> <tname> <tpos> <strand> <qpos> <span> <gap>  (post-chain anchors)
(reference map.c:298-303, 350-354)
"""
import numpy as np
import pytest

from mm2tpu.io.bseq import read_fastx
from mm2tpu.index.build import build_index, MM_I_HPC
from mm2tpu.options import set_opt, mapopt_update
from mm2tpu.mapping.seed import collect_minimizers, collect_seed_hits
from mm2tpu.mapping.chain import chain_dp, chain_gaps
from mm2tpu.utils.hashing import reg_hash


def parse_seeds(path):
    per_read = []
    cur = None
    for line in open(path):
        f = line.rstrip("\n").split("\t")
        if f[0] == "RS":
            cur = {"rep_len": int(f[1]), "SD": [], "CN": []}
            per_read.append(cur)
        elif f[0] == "SD":
            cur["SD"].append((f[1], int(f[2]), f[3], int(f[4]), int(f[5])))
        elif f[0] == "CN":
            cur["CN"].append((int(f[1]), f[2], int(f[3]), f[4], int(f[5]), int(f[6])))
    return per_read


def anchors_to_sd(mi, a):
    out = []
    for x, y in a:
        rid = (int(x) << 1 >> 33) & 0x7FFFFFFF
        out.append((mi.seq[rid].name, np.int32(int(x) & 0xFFFFFFFF).item(),
                    "+-"[int(x) >> 63], np.int32(int(y) & 0xFFFFFFFF).item(),
                    (int(y) >> 32) & 0xFF))
    return out


@pytest.mark.parametrize("preset,golden", [
    ("map-ont", "mapont_MT.seeds"),
    ("map-pb", "mappb_MT.seeds"),
])
def test_seed_and_chain_dump_parity(golden_dir, ref_test_dir, preset, golden):
    io, mo = set_opt(preset)
    refs = list(read_fastx(str(ref_test_dir / "MT-orang.fa")))
    mi = build_index([r.name for r in refs], [r.seq for r in refs],
                     w=io.w, k=io.k, flag=io.flag)
    mapopt_update(mo, mi)
    per_read = parse_seeds(str(golden_dir / golden))
    queries = list(read_fastx(str(ref_test_dir / "MT-human.fa")))
    assert len(per_read) == len(queries)
    for q, exp in zip(queries, per_read):
        mv = collect_minimizers(mi, mo, [q.seq], [q.l_seq])
        sr = collect_seed_hits(mi, mo, mo.mid_occ, mv, q.name, q.l_seq)
        assert sr.rep_len == exp["rep_len"]
        got = anchors_to_sd(mi, sr.anchors)
        assert got == exp["SD"], f"SD mismatch: {len(got)} vs {len(exp['SD'])}"

        gq, gr = chain_gaps(mo, q.l_seq)
        a, u = chain_dp(gr, gq, mo.bw, mo.max_chain_skip, mo.max_chain_iter,
                        mo.min_cnt, mo.min_chain_score, mo.chain_gap_scale,
                        False, 1, sr.anchors, backend="python")
        # CN lines are emitted per region in mm_gen_regs order
        from mm2tpu.mapping.hit import gen_regs
        h = reg_hash(q.name, q.l_seq, mo.seed)
        regs = gen_regs(h, q.l_seq, u, a)
        got_cn = []
        for j, r in enumerate(regs):
            for t in range(r.as_, r.as_ + r.cnt):
                x, y = a[t]
                rid = (int(x) << 1 >> 33) & 0x7FFFFFFF
                got_cn.append((j, mi.seq[rid].name,
                               np.int32(int(x) & 0xFFFFFFFF).item(),
                               "+-"[int(x) >> 63],
                               np.int32(int(y) & 0xFFFFFFFF).item(),
                               (int(y) >> 32) & 0xFF))
        exp_cn = [(c[0], c[1], c[2], c[3], c[4], c[5]) for c in exp["CN"]]
        assert got_cn == exp_cn


def test_cli_print_seeds_golden(golden_dir, ref_test_dir, capfd):
    """--print-seeds CLI dump must byte-match the reference's SD/CN lines
    (map.c:298-303, 350-354)."""
    from mm2tpu.cli import main as cli_main
    import io as _io
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(f"--print-seeds -x map-ont {ref_test_dir}/MT-orang.fa "
                      f"{ref_test_dir}/MT-human.fa".split())
    assert rc == 0
    err = capfd.readouterr().err
    got = [l for l in err.splitlines() if l[:2] in ("SD", "CN", "RS")]
    want = [l for l in (golden_dir / "mapont_MT.seeds").read_text()
            .splitlines() if l[:2] in ("SD", "CN", "RS")]
    assert got == want
