#!/usr/bin/env python
"""Deterministic ONT-like benchmark workload generator.

Produces a multi-contig synthetic genome and error-injected long reads
sampled from it — the bench.py / genome-scale-test input (the role
test/MT-*.fa plays for parity, at tunable scale). Everything is seeded:
the same (genome_mb, n_reads, seed) always yields byte-identical files.

Usage:
    python scripts/make_workload.py --genome-mb 48 --reads 1000 \
        --out-dir /tmp/mm2tpu_bench
"""
import argparse
import os
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)
RC = dict(zip(b"ACGT", b"TGCA"))


def gen_genome(rng, total_bp: int, n_ctg: int, repeat_frac: float = 0.35,
               repeat_div: float = 0.04):
    """Contigs with embedded DIVERGED repeat families: each inserted copy
    mutates the family consensus at `repeat_div` — like real genomes
    (hg38 is ~50% repeats), this multiplies seed hits and chaining work
    without tripping the mid_occ filter the way exact copies do. A pure
    random genome makes chaining ~5% of minimap2's runtime; with
    repeat_frac=0.35/div=0.04 it is ~30-50%, matching the fork's 'top
    hotspot' premise (reference README.md:3)."""
    lens = rng.dirichlet(np.ones(n_ctg)) * total_bp
    lens = np.maximum(lens.astype(np.int64), 10000)
    fams = [BASES[rng.integers(0, 4, int(rng.integers(1000, 8000)))]
            for _ in range(8)]
    ctgs = []
    for i, L in enumerate(lens):
        g = BASES[rng.integers(0, 4, int(L))]
        target = int(L * repeat_frac)
        placed = 0
        while placed < target:
            fam = fams[int(rng.integers(0, len(fams)))]
            rl = int(rng.integers(len(fam) // 2, len(fam)))
            copy = fam[:rl].copy()
            # diverge the copy: iid substitutions at repeat_div
            m = rng.random(rl) < repeat_div
            copy[m] = BASES[(np.searchsorted(BASES, copy[m]) +
                             rng.integers(1, 4, int(m.sum()))) % 4]
            p = int(rng.integers(0, max(1, len(g) - rl)))
            g[p:p + rl] = copy
            placed += rl
        ctgs.append(g)
    return ctgs


def mutate_read(rng, seq: np.ndarray, err: float):
    """Vectorized ONT-style error injection: per-base iid sub/ins/del at
    rates err*(0.5, 0.25, 0.25)."""
    n = len(seq)
    r = rng.random(n)
    subs = r < err * 0.5
    dels = (r >= err * 0.5) & (r < err * 0.75)
    ins = (r >= err * 0.75) & (r < err)
    out = seq.copy()
    out[subs] = BASES[(np.searchsorted(
        BASES, out[subs]) + rng.integers(1, 4, int(subs.sum()))) % 4]
    ins_base = BASES[rng.integers(0, 4, int(ins.sum()))]
    keep = ~dels
    kept = out[keep]
    # positions of the insertion sites within the post-deletion array
    pos = np.cumsum(keep)[ins]
    return np.insert(kept, np.minimum(pos, len(kept)), ins_base)


def write_fasta(path, names, seqs, width=0):
    with open(path, "wb") as f:
        for nm, s in zip(names, seqs):
            f.write(b">" + nm.encode() + b"\n")
            f.write(s.tobytes() + b"\n")


def make(out_dir: str, genome_mb: float, n_reads: int, seed: int = 0,
         err: float = 0.10, mean_len: int = 10000,
         repeat_frac: float = 0.35, repeat_div: float = 0.04) -> tuple:
    os.makedirs(out_dir, exist_ok=True)
    tag = "g%gm_r%d_s%d_e%g_l%d_rf%g_rd%g" % (
        genome_mb, n_reads, seed, err, mean_len, repeat_frac, repeat_div)
    ref = os.path.join(out_dir, "ref_%s.fa" % tag)
    reads = os.path.join(out_dir, "reads_%s.fa" % tag)
    if os.path.exists(ref) and os.path.exists(reads):
        return ref, reads
    rng = np.random.default_rng(seed)
    total = int(genome_mb * 1e6)
    n_ctg = max(1, int(round(total / 8e6)))
    ctgs = gen_genome(rng, total, n_ctg, repeat_frac, repeat_div)
    write_fasta(ref, ["ctg%d" % i for i in range(len(ctgs))], ctgs)

    lens = np.clip(rng.lognormal(np.log(mean_len), 0.5, n_reads),
                   500, 100000).astype(np.int64)
    out_seqs, names = [], []
    weights = np.array([len(c) for c in ctgs], np.float64)
    weights /= weights.sum()
    for i in range(n_reads):
        ci = int(rng.choice(len(ctgs), p=weights))
        g = ctgs[ci]
        L = int(min(lens[i], len(g) - 1))
        st = int(rng.integers(0, len(g) - L + 1))
        s = mutate_read(rng, g[st:st + L], err)
        if rng.integers(0, 2):
            s = np.frombuffer(bytes(s[::-1].tobytes().translate(
                bytes.maketrans(b"ACGT", b"TGCA"))), np.uint8)
        out_seqs.append(s)
        names.append("read%d_ctg%d_%d" % (i, ci, st))
    write_fasta(reads, names, out_seqs)
    return ref, reads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=48)
    ap.add_argument("--reads", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--err", type=float, default=0.10)
    ap.add_argument("--mean-len", type=int, default=10000)
    ap.add_argument("--repeat-frac", type=float, default=0.35)
    ap.add_argument("--repeat-div", type=float, default=0.04)
    ap.add_argument("--out-dir", default="/tmp/mm2tpu_bench")
    args = ap.parse_args()
    ref, reads = make(args.out_dir, args.genome_mb, args.reads, args.seed,
                      args.err, args.mean_len, args.repeat_frac,
                      args.repeat_div)
    print(ref)
    print(reads)
    return 0


if __name__ == "__main__":
    sys.exit(main())
