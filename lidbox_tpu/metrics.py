"""
Streaming evaluation metrics as pure-JAX pytree state.

AverageDetectionCost implements C_avg, eq. 32 of Li, Ma & Lee (2013)
"Spoken language recognition: from fundamentals to practice", Proc. IEEE
101(5) (reference: lidbox/metrics.py).

TPU-first design: metric state is a dict of fixed-shape counter arrays (a
pytree), ``update`` is a pure function built from one-hot einsums instead of
the reference's scatter_nd_add (MXU-friendly, jit/vmap-safe), and state from
data-parallel shards merges with ``jax.lax.psum`` or ``merge_states``.
"""
import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from lidbox_tpu.features import divide_no_nan as _divide_no_nan


@dataclasses.dataclass(frozen=True)
class AverageDetectionCost:
    """Minimum average detection cost over a set of decision thresholds.

    State: false negative / true positive counters [N, T] per label, and
    false positive / true negative counters [N, N, T] per (true-label,
    scored-label) pair; the l == m diagonal stays zero
    (reference: lidbox/metrics.py:24-45).

    Args:
        N: number of labels (>= 2).
        thresholds: [T] decision scores matched to the model's outputs
            (e.g. log-likelihoods).
    """
    N: int
    thresholds: tuple
    C_miss: float = 1.0
    C_fa: float = 1.0
    P_tar: float = 0.5

    def __post_init__(self):
        assert self.N >= 2, "C_avg is undefined for less than 2 classes"
        object.__setattr__(self, "thresholds", tuple(float(t) for t in self.thresholds))

    @property
    def num_thresholds(self):
        return len(self.thresholds)

    def init_state(self) -> Mapping[str, jax.Array]:
        T = self.num_thresholds
        return {
            "fn": jnp.zeros((self.N, T), jnp.float32),
            "tp": jnp.zeros((self.N, T), jnp.float32),
            "fp_pairs": jnp.zeros((self.N, self.N, T), jnp.float32),
            "tn_pairs": jnp.zeros((self.N, self.N, T), jnp.float32),
        }

    def update(self, state, true_positives, predictions, weights=None):
        """Accumulate a batch of one-hot labels [B, N] and scores [B, N]
        (reference: lidbox/metrics.py:51-71).

        ``weights`` [B] scales each example's contribution — pass 0 for
        padded examples in bucketed batches (TPU static-shape addition).
        """
        thresholds = jnp.asarray(self.thresholds, jnp.float32)      # [T]
        onehot = true_positives.astype(jnp.float32)                 # [B, N]
        w = (jnp.ones(onehot.shape[0], jnp.float32) if weights is None
             else weights.astype(jnp.float32))
        # weight the POSITIVE/NEGATIVE masses separately — weighting the
        # one-hot and complementing it (1 - w*onehot) leaves (1-w) fake
        # negative mass on the true class, polluting the pair-counter
        # diagonal for any fractional weight
        weighted_pos = onehot * w[:, None]
        weighted_neg = (1.0 - onehot) * w[:, None]
        scores = predictions.astype(jnp.float32)[:, :, None]        # [B, N, 1]
        pred_pos = (scores >= thresholds).astype(jnp.float32)       # [B, N, T]
        pred_neg = 1.0 - pred_pos

        tp = pred_pos * weighted_pos[:, :, None]
        fn = pred_neg * weighted_pos[:, :, None]
        fp = pred_pos * weighted_neg[:, :, None]
        tn = pred_neg * weighted_neg[:, :, None]

        # Pair counters are scattered by the RAW true-label one-hot (the
        # example weight already rides fp/tn); with one-hot labels this is
        # an einsum over the batch axis (vs scatter_nd_add in the
        # reference) — a dense [B,N]x[B,N,T] contraction on the MXU.
        return {
            "fn": state["fn"] + jnp.sum(fn, axis=0),
            "tp": state["tp"] + jnp.sum(tp, axis=0),
            "fp_pairs": state["fp_pairs"] + jnp.einsum("bl,bmt->lmt", onehot, fp),
            "tn_pairs": state["tn_pairs"] + jnp.einsum("bl,bmt->lmt", onehot, tn),
        }

    def update_sparse(self, state, labels, predictions, weights=None):
        """Accumulate sparse integer labels [B]
        (reference: lidbox/metrics.py:114-119)."""
        onehot = jax.nn.one_hot(labels, self.N, dtype=jnp.float32)
        # Call the dense update explicitly: SparseAverageDetectionCost
        # overrides ``update`` to mean sparse labels.
        return AverageDetectionCost.update(self, state, onehot, predictions,
                                           weights=weights)

    def result(self, state):
        """Smallest C_avg over all thresholds
        (reference: lidbox/metrics.py:73-103)."""
        P_miss = jnp.mean(_divide_no_nan(state["fn"], state["fn"] + state["tp"]),
                          axis=0)                                    # [T]
        n_minus_1 = jnp.float32(self.N - 1)
        pair_rates = _divide_no_nan(state["fp_pairs"],
                                    state["fp_pairs"] + state["tn_pairs"])
        P_fa = jnp.mean(jnp.sum(pair_rates, axis=1) / n_minus_1, axis=0)  # [T]
        C_avg = (self.C_miss * self.P_tar * P_miss
                 + self.C_fa * (1.0 - self.P_tar) * P_fa)
        return jnp.min(C_avg)

    @staticmethod
    def merge_states(*states):
        """Sum counter states from independent shards (host-side analogue of
        psum-ing the state inside pjit)."""
        return jax.tree_util.tree_map(lambda *xs: sum(xs), *states)

    @staticmethod
    def psum_state(state, axis_name):
        """All-reduce the counter state across a mesh axis (call inside
        pjit/shard_map)."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis_name), state)


class SparseAverageDetectionCost(AverageDetectionCost):
    """Sparse-label alias mirroring the reference class split
    (reference: lidbox/metrics.py:114-119)."""

    def update(self, state, labels, predictions, weights=None):
        return AverageDetectionCost.update_sparse(self, state, labels,
                                                  predictions, weights=weights)


def equal_error_rate(scores, labels, convention="fpr"):
    """Per-class EER from ROC, numpy host-side. scores: [B] for one class,
    labels: [B] binary. THE single EER implementation — the report path
    (util.classification_report) calls this too, so both surfaces always
    agree on shared scores.

    Only DISTINCT scores define thresholds: tied scores are collapsed to
    one ROC point (as sklearn.metrics.roc_curve does), because operating
    points inside a tie block are not achievable by any threshold —
    without this, the result depends on the argsort order of tied trials.
    The all-rejected endpoint (fnr=1, fpr=0) is included, matching the
    sklearn ROC the reference searched over.

    ``convention`` picks the value reported at the ROC point closest to
    fnr == fpr:

    - ``"fpr"`` (default): the false-positive rate at that point — the
      reference's convention (reference: lidbox/util.py:91-98, which took
      ``fpr[argmin |fnr - fpr|]`` off sklearn's roc_curve).
    - ``"midpoint"``: (fnr + fpr) / 2 — the symmetric estimate, less
      biased when the ROC is coarse (small trial counts).

    .. note:: the default CHANGED in round 4: earlier releases returned
       the midpoint here while the report path used the reference's fpr
       convention — two silently different EERs for the same scores. The
       unified default is the reference's ``"fpr"``; pass
       ``convention="midpoint"`` to reproduce previously logged values
       from this function.
    """
    if convention not in ("fpr", "midpoint"):
        raise ValueError(f"unknown EER convention {convention!r} "
                         "(expected 'fpr' or 'midpoint')")
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    order = np.argsort(-scores, kind="stable")
    s = scores[order]
    labels = labels[order]
    P = labels.sum()
    Nn = len(labels) - P
    if P == 0 or Nn == 0:
        return float("nan")
    tps = np.cumsum(labels)
    fps = np.cumsum(1 - labels)
    distinct = np.r_[s[1:] != s[:-1], True]  # last index of each tie block
    fnr = np.r_[1.0, 1.0 - tps[distinct] / P]  # prepend all-rejected point
    fpr = np.r_[0.0, fps[distinct] / Nn]
    i = np.nanargmin(np.abs(fnr - fpr))
    if convention == "fpr":
        return float(fpr[i])
    return float((fnr[i] + fpr[i]) / 2.0)


def cavg_thresholds(num_thresholds=100, lo=-10.0, hi=0.0):
    """Default threshold grid over log-score range (reference
    keras_utils.py:45-52 uses tf.linspace from config)."""
    return tuple(np.linspace(lo, hi, num_thresholds).tolist())
