"""Vectorized numpy neural-net kernels used by the scorer stages.

The reference engine runs its encoders/heads with PyTorch; this container has
no torch, so the forward math is re-expressed as numpy kernels with the same
op order and shapes (float32 throughout). Shapes/ops mirror:

- Conv1d(k, padding) + ReLU + MaxPool-over-L: reference
  ``opennre/encoder/cnn_encoder.py:46-65``
- piecewise pooling additive ``-100`` mask: reference
  ``opennre/encoder/pcnn_encoder.py:54-80``
- linear head + softmax: reference ``opennre/model/softmax_nn.py:41-54``
- tiny transformer encoder (BERT-shaped) for the T3/T4 paths — standard
  post-LN BERT layer math, sized down (no public checkpoint is shipped in
  this sandbox, weights are seeded; see registry.py).

Everything here is pure (weights in, batch in, batch out) so scorer actors
can hold the weight dicts in ``__init__`` and call these per batch.
"""

from __future__ import annotations

import numpy as np


def linear(x: np.ndarray, w: np.ndarray, b: np.ndarray | None = None) -> np.ndarray:
    """x:(...,I) @ w:(O,I)^T + b:(O,) — torch ``nn.Linear`` layout."""
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def gelu(x: np.ndarray) -> np.ndarray:
    """tanh-approximation GELU (BERT's original activation)."""
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def layer_norm(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
               eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def conv1d(x: np.ndarray, w: np.ndarray, b: np.ndarray,
           padding: int = 1) -> np.ndarray:
    """1-D convolution over the sequence axis.

    Args:
        x: (B, L, C) input (channels last — transposed from torch's (B, C, L)).
        w: (H, C, K) torch ``nn.Conv1d`` weight layout.
        b: (H,) bias.
    Returns:
        (B, Lout, H) with Lout = L + 2*padding - K + 1.
    """
    B, L, C = x.shape
    H, _, K = w.shape
    if padding:
        x = np.pad(x, ((0, 0), (padding, padding), (0, 0)))
    Lp = L + 2 * padding
    Lout = Lp - K + 1
    # One fully-contiguous GEMM against the K kernels side by side, then K
    # shifted-view adds: y[l] = Σ_j x[l+j]·W_j. Avoids both the im2col
    # (B·L, C·K) copy (allocation-heavy under many concurrent workers) and
    # slow strided batched matmuls.
    wcat = w.transpose(1, 2, 0).reshape(C, K * H)  # (C, K*H), m = j*H + h
    z = (x.reshape(B * Lp, C) @ wcat).reshape(B, Lp, K, H)
    y = z[:, 0:Lout, 0]
    for j in range(1, K):
        y = y + z[:, j: j + Lout, j]
    return y + b


def max_pool_seq(x: np.ndarray) -> np.ndarray:
    """Max over the sequence axis: (B, L, H) -> (B, H)."""
    return x.max(axis=1)


def attention_layer(x: np.ndarray, att_mask: np.ndarray, p: dict, n_heads: int) -> np.ndarray:
    """One BERT self-attention block (post-LN), float32.

    x: (B, L, H); att_mask: (B, L) with 1 for real tokens.
    p holds q_w/q_b/k_w/k_b/v_w/v_b/o_w/o_b/ln_g/ln_b.
    """
    B, L, H = x.shape
    d = H // n_heads
    q = linear(x, p["q_w"], p["q_b"]).reshape(B, L, n_heads, d).transpose(0, 2, 1, 3)
    k = linear(x, p["k_w"], p["k_b"]).reshape(B, L, n_heads, d).transpose(0, 2, 1, 3)
    v = linear(x, p["v_w"], p["v_b"]).reshape(B, L, n_heads, d).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)            # (B, h, L, L)
    scores = scores + (1.0 - att_mask[:, None, None, :]) * -10000.0
    ctx = softmax(scores) @ v                                     # (B, h, L, d)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
    out = linear(ctx, p["o_w"], p["o_b"])
    return layer_norm(x + out, p["ln_g"], p["ln_b"])


def ffn_layer(x: np.ndarray, p: dict) -> np.ndarray:
    """BERT feed-forward block (post-LN): GELU inner, residual + LN."""
    inner = gelu(linear(x, p["i_w"], p["i_b"]))
    out = linear(inner, p["f_w"], p["f_b"])
    return layer_norm(x + out, p["f_ln_g"], p["f_ln_b"])
