"""On-device ranking metrics: ROC-AUC and average precision (layer L5).

The reference computes AUC on host over dumped score files (SURVEY.md §2
"Evaluation / AUC").  Here both metrics run on device from a single argsort,
support tie handling (average ranks) and per-row weights (so padded shards
evaluate correctly), and are jit-friendly (static shapes, no host sync).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _average_ranks(scores: jax.Array) -> jax.Array:
    """1-based ranks with ties sharing their average rank.  O(B log B)."""
    B = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]
    ranks_sorted = jnp.arange(1, B + 1, dtype=jnp.float32)
    # Average the ranks within each tie group: for each element, mean of
    # ranks of equal values = (first + last) / 2 within its group.
    is_new = jnp.concatenate(
        [jnp.array([True]), sorted_scores[1:] != sorted_scores[:-1]]
    )
    group_id = jnp.cumsum(is_new) - 1                      # [B]
    n_groups = B  # upper bound; unused slots stay zero
    group_sum = jax.ops.segment_sum(ranks_sorted, group_id, num_segments=n_groups)
    group_cnt = jax.ops.segment_sum(
        jnp.ones_like(ranks_sorted), group_id, num_segments=n_groups
    )
    avg_sorted = group_sum[group_id] / jnp.maximum(group_cnt[group_id], 1.0)
    ranks = jnp.zeros(B, dtype=jnp.float32).at[order].set(avg_sorted)
    return ranks


def auc(
    scores: jax.Array,
    labels: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """ROC-AUC via the Mann-Whitney rank statistic, with tie correction.

    weights==0 rows (padding) are pushed out of the statistic by zeroing
    their label and count contributions.
    """
    scores = scores.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    if weights is None:
        w = jnp.ones_like(y)
    else:
        w = weights.astype(jnp.float32)
    # Push padded rows to the bottom of the ranking deterministically and
    # exclude them from counts.
    eff_scores = jnp.where(w > 0, scores, -jnp.inf)
    ranks = _average_ranks(eff_scores)
    pos = y * w
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum((1.0 - y) * w)
    n_pad = jnp.sum(w <= 0)
    # Padded rows occupy the lowest ranks; shift real ranks down so the
    # statistic is over real rows only.  (With ties among -inf rows the
    # average-rank of pads is (n_pad+1)/2 and real ranks start above n_pad.)
    rank_sum_pos = jnp.sum(pos * (ranks - n_pad))
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), jnp.float32(0.5))


def average_precision(
    scores: jax.Array,
    labels: jax.Array,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Average precision (area under the precision-recall curve, step interp).

    AP = sum_i P@i * 1[label_i = 1] / n_pos over rows sorted by descending
    score.  Ties are broken by sort order (matching common implementations).
    """
    scores = scores.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    if weights is None:
        w = jnp.ones_like(y)
    else:
        w = weights.astype(jnp.float32)
    eff = jnp.where(w > 0, scores, -jnp.inf)
    order = jnp.argsort(-eff)
    y_sorted = (y * w)[order]
    w_sorted = w[order]
    tp_cum = jnp.cumsum(y_sorted)
    seen = jnp.cumsum(w_sorted)
    precision_at = tp_cum / jnp.maximum(seen, 1.0)
    n_pos = jnp.sum(y * w)
    ap = jnp.sum(precision_at * y_sorted) / jnp.maximum(n_pos, 1.0)
    return jnp.where(n_pos > 0, ap, jnp.float32(0.0))
