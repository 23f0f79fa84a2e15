"""Evolutionary subnet search under an efficiency constraint.

Reference: EvolutionFinder + ArchManager (tutorial/evolution_finder.py:
9-213): random population, mutation of per-block ks/e and per-stage depth
(and resolution), uniform crossover, keep top parent_ratio by predicted
accuracy, loop. Generalized over this framework's SearchSpace, with the SR
pixel_d as an extra mutable gene and any (efficiency_fn, quality_fn) pair —
closed-form FLOPs / measured TPU latency / predictor MLP all plug in.
"""

from __future__ import annotations

import random
from typing import Callable, Optional

from ..models.arch import SearchSpace, SubnetConfig, sample_subnet


class EvolutionFinder:
    def __init__(self, space: SearchSpace, efficiency_fn: Callable,
                 quality_fn: Callable, *, n_trunks=1,
                 mutate_prob=0.1, population_size=100, max_time_budget=500,
                 parent_ratio=0.25, mutation_ratio=0.5, seed=None):
        self.space = space
        self.n_trunks = n_trunks
        self.efficiency_fn = efficiency_fn  # cfg -> scalar (flops/latency)
        self.quality_fn = quality_fn        # cfg -> scalar (psnr/accuracy)
        self.mutate_prob = mutate_prob
        self.population_size = population_size
        self.max_time_budget = max_time_budget
        self.parent_ratio = parent_ratio
        self.mutation_ratio = mutation_ratio
        self.rng = random.Random(seed)

    # -- genetic operators (ArchManager semantics, evolution_finder.py:9-50) --

    def random_valid(self, constraint):
        while True:
            cfg = self._random()
            if self.efficiency_fn(cfg) <= constraint:
                return cfg

    def _random(self):
        sp = self.space
        n_blocks = sp.blocks_per_trunk * self.n_trunks
        return SubnetConfig(
            ks=tuple(self.rng.choice(sp.ks_list) for _ in range(n_blocks)),
            e=tuple(self.rng.choice(sp.expand_list) for _ in range(n_blocks)),
            d=tuple(self.rng.choice(sp.depth_list)
                    for _ in range(sp.n_stages * self.n_trunks)),
            pixel_d=self.rng.choice(sp.pixel_d_list))

    def mutate(self, cfg: SubnetConfig, constraint):
        sp = self.space
        while True:
            ks = list(cfg.ks)
            e = list(cfg.e)
            d = list(cfg.d)
            pixel_d = cfg.pixel_d
            for i in range(len(ks)):
                if self.rng.random() < self.mutate_prob:
                    ks[i] = self.rng.choice(sp.ks_list)
                if self.rng.random() < self.mutate_prob:
                    e[i] = self.rng.choice(sp.expand_list)
            for i in range(len(d)):
                if self.rng.random() < self.mutate_prob:
                    d[i] = self.rng.choice(sp.depth_list)
            if self.rng.random() < self.mutate_prob:
                pixel_d = self.rng.choice(sp.pixel_d_list)
            new = SubnetConfig(tuple(ks), tuple(e), tuple(d), pixel_d)
            if self.efficiency_fn(new) <= constraint:
                return new

    def crossover(self, a: SubnetConfig, b: SubnetConfig, constraint):
        while True:
            ks = tuple(self.rng.choice([x, y]) for x, y in zip(a.ks, b.ks))
            e = tuple(self.rng.choice([x, y]) for x, y in zip(a.e, b.e))
            d = tuple(self.rng.choice([x, y]) for x, y in zip(a.d, b.d))
            pd = self.rng.choice([a.pixel_d, b.pixel_d])
            new = SubnetConfig(ks, e, d, pd)
            if self.efficiency_fn(new) <= constraint:
                return new

    # -- the search loop (run_evolution_search, evolution_finder.py:151-213) --

    def run(self, constraint, verbose=False):
        n_mut = int(round(self.mutation_ratio * self.population_size))
        n_par = int(round(self.parent_ratio * self.population_size))

        population = [self.random_valid(constraint)
                      for _ in range(self.population_size)]
        scores = {c: self.quality_fn(c) for c in population}
        best = max(population, key=lambda c: scores[c])
        history = [scores[best]]

        for it in range(self.max_time_budget):
            parents = sorted(population, key=lambda c: scores[c],
                             reverse=True)[:n_par]
            if scores[parents[0]] > scores[best]:
                best = parents[0]
            history.append(scores[best])
            if verbose:
                print("iter %d: best %.4f" % (it, scores[best]))

            population = list(parents)
            for _ in range(n_mut):
                child = self.mutate(self.rng.choice(parents), constraint)
                population.append(child)
                scores.setdefault(child, self.quality_fn(child))
            while len(population) < self.population_size:
                child = self.crossover(self.rng.choice(parents),
                                       self.rng.choice(parents), constraint)
                population.append(child)
                scores.setdefault(child, self.quality_fn(child))

        return best, scores[best], history
