"""Differential fuzzer: random genomes/reads x presets x flag subsets,
byte-diffed against the reference binary (/tmp/golden/minimap2-golden).

Usage: python scripts/fuzz_diff.py [n_iters] [base_seed]
Prints one line per case; FAIL lines reproduce with the printed seed.
"""
import io
import os
import subprocess
import sys
import tempfile
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm2tpu.cli import main as cli_main  # noqa: E402

GOLDEN = "/tmp/golden/minimap2-golden"
RC = str.maketrans("ACGT", "TGCA")

PRESETS = ["map-ont", "map-pb", "asm5", "asm10", "asm20", "sr",
           "splice"]
FLAG_POOL = [
    [], ["-c"], ["-a"], ["-c", "--cs"], ["-a", "--eqx"], ["-a", "--MD"],
    ["-c", "-N", "8"], ["-a", "-Y"], ["-c", "--secondary", "no"],
    ["-c", "-p", "0.3"], ["-a", "-z", "150"], ["-c", "-r", "200"],
    ["-c", "-T", "20"], ["-c", "-g", "1500"], ["-a", "--end-bonus", "5"],
]


def gen_case(rng, tmp):
    bases = np.array(list("ACGT"))

    def rs(n):
        return "".join(bases[rng.integers(0, 4, n)])

    nctg = int(rng.integers(1, 4))
    rep = rs(int(rng.integers(500, 3000)))
    ctgs = {}
    for c in range(nctg):
        g = rs(int(rng.integers(5000, 120000)))
        if rng.random() < 0.5:  # insert repeats
            p = int(rng.integers(0, len(g)))
            g = g[:p] + rep + g[p:]
        ctgs[f"c{c}"] = g
    ref = os.path.join(tmp, "ref.fa")
    with open(ref, "w") as f:
        for n, s in ctgs.items():
            f.write(f">{n}\n{s}\n")
    reads = os.path.join(tmp, "reads.fa")
    names = list(ctgs)
    err = float(rng.uniform(0.0, 0.25))
    with open(reads, "w") as f:
        for i in range(int(rng.integers(5, 30))):
            g = ctgs[names[int(rng.integers(0, nctg))]]
            L = int(rng.integers(100, min(len(g), 9000)))
            st = int(rng.integers(0, len(g) - L + 1))
            s = list(g[st:st + L])
            for _ in range(int(err * L)):
                p = int(rng.integers(0, len(s)))
                k = rng.integers(0, 3)
                if k == 0:
                    s[p] = "ACGT"[rng.integers(0, 4)]
                elif k == 1:
                    s[p] = ""
                else:
                    s[p] = s[p] + "ACGT"[rng.integers(0, 4)]
            seq = "".join(s)
            if rng.random() < 0.15:  # inject an N run
                p = int(rng.integers(0, max(1, len(seq) - 10)))
                seq = seq[:p] + "N" * int(rng.integers(1, 30)) + seq[p:]
            if rng.integers(0, 2):
                seq = seq[::-1].translate(RC)
            f.write(f">r{i}\n{seq}\n")
        if rng.random() < 0.3:  # a few degenerate reads
            f.write(">tiny\nACGTAC\n>nn\n" + "N" * 40 + "\n")
    return ref, reads


def gen_dense_case(rng, tmp):
    """Anchor-dense case: a genome of moderately-duplicated segments (each
    unit copied a few times stays under mid_occ) and long reads spanning
    many units, so single chaining tasks exceed the 8192-anchor routing
    threshold — the regime the static router sends to the bounded-lookback
    device kernel (chain.c:66-68). Run with --chain-backend native to pin
    the exact-DP semantics differentially at high n."""
    bases = np.array(list("ACGT"))

    def rs(n):
        return "".join(bases[rng.integers(0, 4, n)])

    units = [rs(int(rng.integers(150, 400))) for _ in range(30)]
    copies = []
    for u in units:
        copies += [u] * int(rng.integers(3, 7))
    rng.shuffle(copies)
    g = rs(2000) + "".join(copies) + rs(2000)
    ref = os.path.join(tmp, "ref.fa")
    with open(ref, "w") as f:
        f.write(">dense\n%s\n" % g)
    reads = os.path.join(tmp, "reads.fa")
    with open(reads, "w") as f:
        for i in range(int(rng.integers(2, 5))):
            L = int(rng.integers(15000, min(len(g), 40000)))
            st = int(rng.integers(0, len(g) - L + 1))
            s = list(g[st:st + L])
            for _ in range(int(0.05 * L)):
                p = int(rng.integers(0, len(s)))
                s[p] = "ACGT"[rng.integers(0, 4)]
            seq = "".join(s)
            if rng.integers(0, 2):
                seq = seq[::-1].translate(RC)
            f.write(">d%d\n%s\n" % (i, seq))
    return ref, reads


def run_mine(args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main(args)
    return "\n".join(l for l in buf.getvalue().splitlines()
                     if not l.startswith("@PG"))


def run_ref(args):
    r = subprocess.run([GOLDEN, "-t", "1"] + args, capture_output=True,
                       text=True, timeout=600)
    return "\n".join(l for l in r.stdout.splitlines()
                     if not l.startswith("@PG"))


def gen_pair(rng, tmp, ref):
    """Paired-end mate files drawn from the reference."""
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
    r1 = os.path.join(tmp, "r1.fq")
    r2 = os.path.join(tmp, "r2.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(int(rng.integers(10, 60))):
            g = ctgs[names[int(rng.integers(0, len(names)))]]
            isz = int(rng.integers(220, 600))
            if len(g) < isz + 10:
                continue
            st = int(rng.integers(0, len(g) - isz))
            a = list(g[st:st + 100])
            b = list(g[st + isz - 100:st + isz])
            for r in (a, b):
                for _ in range(int(rng.integers(0, 4))):
                    p = int(rng.integers(0, len(r)))
                    r[p] = "ACGT"[rng.integers(0, 4)]
            bseq = "".join(b)[::-1].translate(RC)
            f1.write(f"@p{i}/1\n{''.join(a)}\n+\n{'I' * len(a)}\n")
            f2.write(f"@p{i}/2\n{bseq}\n+\n{'I' * len(bseq)}\n")
    return r1, r2


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = 0
    for it in range(iters):
        seed = base + it
        rng = np.random.default_rng(seed)
        with tempfile.TemporaryDirectory() as tmp:
            mode = rng.random()
            if mode >= 0.92:  # anchor-dense, >8192 anchors per task
                ref, reads = gen_dense_case(rng, tmp)
                flags = [["-c"], ["-a"], []][int(rng.integers(0, 3))]
                args = (["-x", "map-ont", "--chain-backend", "native"] +
                        flags + [ref, reads])
                try:
                    mine = run_mine(list(args))
                except SystemExit:
                    mine = "<exit>"
                except Exception as e:  # noqa: BLE001
                    mine = f"<exception {type(e).__name__}: {e}>"
                theirs = run_ref([a for a in args
                                  if a not in ("--chain-backend", "native")])
                ok = mine == theirs
                fails += not ok
                print(f"{'ok  ' if ok else 'FAIL'} seed={seed} dense "
                      f"({len(mine)}B)")
                if not ok:
                    open(f"/tmp/fuzz_fail_{seed}_mine.txt", "w").write(mine)
                    open(f"/tmp/fuzz_fail_{seed}_ref.txt", "w").write(theirs)
                continue
            ref, reads = gen_case(rng, tmp)
            if mode < 0.15:  # paired-end sr
                r1, r2 = gen_pair(rng, tmp, ref)
                flags = [[], ["-a"], ["-a", "--MD"]][int(rng.integers(0, 3))]
                args = ["-x", "sr"] + flags + [ref, r1, r2]
            elif mode < 0.30:  # multi-part index (+ sometimes split-prefix)
                preset = ["map-ont", "map-pb"][int(rng.integers(0, 2))]
                flags = ["-c", "-I", f"{int(rng.integers(30, 120))}k"]
                if rng.random() < 0.5:
                    flags += ["--split-prefix", os.path.join(tmp, "sp")]
                args = ["-x", preset] + flags + [ref, reads]
            elif mode < 0.40:  # HPC sketching
                flags = [["-c"], ["-a"]][int(rng.integers(0, 2))]
                args = ["-x", "map-ont", "-H"] + flags + [ref, reads]
            else:
                preset = PRESETS[int(rng.integers(0, len(PRESETS)))]
                flags = list(FLAG_POOL[int(rng.integers(0, len(FLAG_POOL)))])
                if preset == "splice":
                    flags += ["-G", "2k"]  # cap unbanded exts2 fill sizes
                args = ["-x", preset] + flags + [ref, reads]
            try:
                mine = run_mine(list(args))
            except SystemExit:
                mine = "<exit>"
            except Exception as e:  # noqa: BLE001
                mine = f"<exception {type(e).__name__}: {e}>"
            theirs = run_ref(args)
            ok = mine == theirs
            fails += not ok
            shown = " ".join(a for a in args[:-2]
                             if not a.startswith(tmp))
            print(f"{'ok  ' if ok else 'FAIL'} seed={seed} {shown} "
                  f"({len(mine)}B)")
            if not ok:
                open(f"/tmp/fuzz_fail_{seed}_mine.txt", "w").write(mine)
                open(f"/tmp/fuzz_fail_{seed}_ref.txt", "w").write(theirs)
    print(f"{iters - fails}/{iters} identical")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
