"""Accuracy/PSNR predictor MLP (reference tutorial/accuracy_predictor.py:
23-84: Linear(128,400) + ReLU x3 + Linear(400,1), pretrained weights
downloaded). Same architecture in JAX, with a training routine on
(encoding, metric) pairs instead of a download (zero-egress environment)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


class AccuracyPredictor:
    def __init__(self, in_dim, hidden=400, n_layers=3, seed=0):
        self.in_dim = in_dim
        self.hidden = hidden
        self.n_layers = n_layers
        key = jax.random.PRNGKey(seed)
        dims = [in_dim] + [hidden] * n_layers + [1]
        self.params = []
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            key, k = jax.random.split(key)
            std = 1.0 / np.sqrt(a)
            self.params.append({
                "w": jax.random.uniform(k, (a, b), jnp.float32, -std, std),
                "b": jnp.zeros((b,), jnp.float32),
            })
        # base offset learned during fit (the pretrained reference model
        # predicts absolute accuracy; we normalize targets)
        self.mu, self.sigma = 0.0, 1.0

    @staticmethod
    def _forward(params, x):
        for layer in params[:-1]:
            x = jnp.maximum(x @ layer["w"] + layer["b"], 0)
        return (x @ params[-1]["w"] + params[-1]["b"])[..., 0]

    def predict(self, feats):
        feats = jnp.asarray(np.atleast_2d(feats), jnp.float32)
        out = self._forward(self.params, feats)
        return np.asarray(out) * self.sigma + self.mu

    def fit(self, feats, targets, *, epochs=200, lr=1e-3, batch_size=256,
            seed=0):
        feats = np.asarray(feats, np.float32)
        targets = np.asarray(targets, np.float32)
        self.mu = float(targets.mean())
        self.sigma = float(targets.std() + 1e-8)
        y = (targets - self.mu) / self.sigma

        tx = optax.adam(lr)
        opt = tx.init(self.params)

        @jax.jit
        def step(params, opt, xb, yb):
            def loss_fn(p):
                pred = self._forward(p, xb)
                return jnp.mean(jnp.square(pred - yb))
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), opt, loss

        rng = np.random.RandomState(seed)
        n = len(feats)
        params = self.params
        loss = np.inf
        for _ in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n, batch_size):
                idx = order[i:i + batch_size]
                params, opt, loss = step(params, opt,
                                         jnp.asarray(feats[idx]),
                                         jnp.asarray(y[idx]))
        self.params = params
        return float(loss)
