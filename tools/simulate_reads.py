#!/usr/bin/env python
"""Seedable paired-end read simulator (wgsim-equivalent).

Capability parity with the reference's bundled wgsim (reference:
wgsim/wgsim.c): mutates a diploid copy of the reference (SNPs + indels),
samples read pairs with normally distributed insert sizes, applies a
uniform base error rate, and encodes the true position in the read name
(`<id>:Pos=<1-based-pos>`), compatible with tools/evaluate_sam.py and the
reference's own SamEvaluation.  Unlike the reference tool, the seed is
settable (-S), making simulations reproducible.

Usage:
  python tools/simulate_reads.py ref.fa r1.fq r2.fq \
      [-N reads] [-l len] [-d dist] [-s std] [-e err] [-r mut] [-R indelfrac] [-S seed]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def simulate(
    fa: str,
    out1: str,
    out2: str,
    n_reads: int = 2000,
    read_len: int = 150,
    dist: int = 500,
    std: int = 50,
    err: float = 0.01,
    mut: float = 0.001,
    indel_frac: float = 0.15,
    seed: int = 11,
) -> None:
    sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
    from kart_tpu.index.format import parse_fasta

    rng = np.random.default_rng(seed)
    seqs = parse_fasta(fa)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    # one mutated haplotype per chromosome: SNPs and short indels
    haplos = []
    total_len = 0
    for s in seqs:
        g = s.seq.copy()
        n_mut = rng.binomial(len(g), mut)
        mut_pos = np.sort(rng.choice(len(g), size=min(n_mut, len(g)), replace=False))
        parts = []
        prev = 0
        for p in mut_pos:
            parts.append(g[prev:p])
            if rng.random() < indel_frac:  # indel
                if rng.random() < 0.5 and p + 3 < len(g):  # deletion
                    prev = p + int(rng.integers(1, 4))
                    continue
                ins = bases[rng.integers(0, 4, size=int(rng.integers(1, 4)))]
                parts.append(ins)
                prev = p
            else:  # SNP
                parts.append(np.array([bases[rng.integers(0, 4)]], np.uint8))
                prev = p + 1
        parts.append(g[prev:])
        h = np.concatenate(parts)
        haplos.append((s.name, h))
        total_len += len(h)

    comp = np.full(256, ord("N"), np.uint8)
    for a, b in zip(b"ACGTacgt", b"TGCATGCA"):
        comp[a] = b
    qline = "I" * read_len

    n_pairs = n_reads // 2
    with open(out1, "w") as f1, open(out2, "w") as f2:
        for i in range(n_pairs):
            # pick chromosome proportional to length
            w = np.array([len(h) for _, h in haplos], dtype=np.float64)
            ci = int(rng.choice(len(haplos), p=w / w.sum()))
            name, h = haplos[ci]
            insert = max(2 * read_len, int(rng.normal(dist, std)))
            if len(h) <= insert:
                continue
            p = int(rng.integers(0, len(h) - insert))
            frag = h[p : p + insert].copy()
            fwd = frag[:read_len].copy()
            rev = comp[frag[-read_len:][::-1]].copy()
            for r in (fwd, rev):
                ne = rng.binomial(read_len, err)
                if ne:
                    ix = rng.integers(0, read_len, ne)
                    r[ix] = bases[rng.integers(0, 4, ne)]
            f1.write(f"@{i}:Pos={p + 1}\t/1\n{fwd.tobytes().decode()}\n+\n{qline}\n")
            f2.write(f"@{i}:Pos={p + 1}\t/2\n{rev.tobytes().decode()}\n+\n{qline}\n")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref")
    ap.add_argument("out1")
    ap.add_argument("out2")
    ap.add_argument("-N", type=int, default=2000, help="total reads (pairs*2)")
    ap.add_argument("-l", type=int, default=150, help="read length")
    ap.add_argument("-d", type=int, default=500, help="outer insert distance")
    ap.add_argument("-s", type=int, default=50, help="insert stddev")
    ap.add_argument("-e", type=float, default=0.01, help="base error rate")
    ap.add_argument("-r", type=float, default=0.001, help="mutation rate")
    ap.add_argument("-R", type=float, default=0.15, help="indel fraction of mutations")
    ap.add_argument("-S", type=int, default=11, help="random seed")
    a = ap.parse_args()
    simulate(a.ref, a.out1, a.out2, a.N, a.l, a.d, a.s, a.e, a.r, a.R, a.S)
    return 0


if __name__ == "__main__":
    sys.exit(main())
