"""Reference-shaped pure-Python EM baseline (measurement only).

The reference implements EM as per-triplet Python triple loops over (k,l,m)
with dict/list state and in-place accumulator updates (SURVEY.md §2 L3,
BASELINE.json north star).  This module re-creates that *computational
shape* from the published equations (SURVEY.md §1.2) — stdlib only, no
NumPy in the hot loop — so the single-chip speedup target ("greater than
100x over reference CPU EM", BASELINE.json:5) can be measured against a
faithful stand-in on this machine.  NOT part of the framework; never
imported by package code.

Written from the math, not ported: the reference mount was empty this
session (SURVEY.md §0).
"""

from __future__ import annotations

import random
import time
from typing import Dict, List, Sequence, Tuple


class PurePythonMMSBM:
    """Dict-and-list MMSBM EM, one interpreted op at a time."""

    def __init__(self, n_genes: int, k: int, n_ratings: int, seed: int = 0):
        self.k = k
        self.n_ratings = n_ratings
        rng = random.Random(seed)
        self.theta: Dict[int, List[float]] = {}
        for g in range(n_genes):
            row = [rng.random() for _ in range(k)]
            s = sum(row)
            self.theta[g] = [v / s for v in row]
        self.p: List[List[List[List[float]]]] = []
        for _ in range(k):
            pl = []
            for _ in range(k):
                pm = []
                for _ in range(k):
                    cell = [rng.random() for _ in range(n_ratings)]
                    s = sum(cell)
                    pm.append([v / s for v in cell])
                pl.append(pm)
            self.p.append(pl)

    def make_iteration(
        self,
        triplets: Sequence[Tuple[int, int, int]],
        ratings: Sequence[int],
        degrees: Dict[int, int],
    ) -> float:
        """One EM sweep; returns the log-likelihood of the old params."""
        import math

        K, R = self.k, self.n_ratings
        theta, p = self.theta, self.p
        ntheta: Dict[int, List[float]] = {g: [0.0] * K for g in theta}
        npr = [
            [[[0.0] * R for _ in range(K)] for _ in range(K)] for _ in range(K)
        ]
        loglik = 0.0
        for (i, j, e), r in zip(triplets, ratings):
            ti, tj, te = theta[i], theta[j], theta[e]
            # E-step: denominator
            D = 0.0
            for a in range(K):
                tia = ti[a]
                pa = p[a]
                for b in range(K):
                    tab = tia * tj[b]
                    pab = pa[b]
                    for c in range(K):
                        D += tab * te[c] * pab[c][r]
            loglik += math.log(D) if D > 0 else -745.0
            inv = 1.0 / D if D > 0 else 0.0
            # M accumulate: omega contributions in place
            ni, nj, ne = ntheta[i], ntheta[j], ntheta[e]
            for a in range(K):
                tia = ti[a]
                pa = p[a]
                npa = npr[a]
                for b in range(K):
                    tab = tia * tj[b]
                    pab = pa[b]
                    npab = npa[b]
                    for c in range(K):
                        w = tab * te[c] * pab[c][r] * inv
                        ni[a] += w
                        nj[b] += w
                        ne[c] += w
                        npab[c][r] += w
        # Normalize: theta rows by degree, p cells over ratings; swap.
        for g, row in ntheta.items():
            d = degrees.get(g, 0)
            if d > 0:
                self.theta[g] = [v / d for v in row]
        for a in range(K):
            for b in range(K):
                for c in range(K):
                    cell = npr[a][b][c]
                    s = sum(cell)
                    if s > 0:
                        self.p[a][b][c] = [v / s for v in cell]
        return loglik


def measure_triplets_per_sec(
    n_triplets: int = 200,
    n_genes: int = 100,
    k: int = 10,
    n_ratings: int = 2,
    seed: int = 0,
    min_seconds: float = 1.0,
) -> float:
    """Measure sustained reference-shaped EM throughput (triplets/s)."""
    rng = random.Random(seed)
    triplets = []
    for _ in range(n_triplets):
        t = rng.sample(range(n_genes), 3)
        triplets.append((t[0], t[1], t[2]))
    ratings = [rng.randrange(n_ratings) for _ in range(n_triplets)]
    degrees: Dict[int, int] = {}
    for t in triplets:
        for g in t:
            degrees[g] = degrees.get(g, 0) + 1

    model = PurePythonMMSBM(n_genes, k, n_ratings, seed)
    model.make_iteration(triplets, ratings, degrees)  # warm up
    done = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_seconds:
        model.make_iteration(triplets, ratings, degrees)
        done += n_triplets
    return done / (time.perf_counter() - t0)


if __name__ == "__main__":
    tps = measure_triplets_per_sec()
    print(f"pure-Python reference-shaped EM: {tps:,.0f} triplets/s at K=10")
