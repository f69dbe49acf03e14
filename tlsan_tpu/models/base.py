"""Shared model substrate: losses, logits, catalog scoring.

These free functions implement the template every full model shares
(reference: TLSAN/model.py:137-172 and the same block in the other model.py
files): pointwise dot-product logits with item bias, sigmoid cross-entropy
loss with table-level L2, and the full-catalog eval matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pointwise_logits(u_repr, i_emb, i_b=None):
    """logits = Σ(u ⊙ i) [+ i_b]  (reference: TLSAN/model.py:137)."""
    logits = jnp.sum(u_repr * i_emb, axis=-1)
    if i_b is not None:
        logits = logits + i_b
    return logits


def full_catalog_logits(u_repr, all_emb, all_b=None):
    """eval_logits = u @ all_emb.T [+ item_b]  (reference: TLSAN/model.py:140).

    On the MXU this is a [B, D] × [D, I] matmul; accumulate in f32.
    """
    logits = jax.lax.dot_general(
        u_repr, all_emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32 inputs: the session default truncates to bf16, which perturbs
        # top-k ranking and the pos/neg AUC comparison; at [B,64]×[64,I]
        # this matmul is far from the step's critical path
        precision="highest",
    )
    if all_b is not None:
        logits = logits + all_b
    return logits


def sigmoid_ce_loss(logits, labels, valid=None):
    """mean sigmoid cross-entropy (reference: TLSAN/model.py:171).

    `valid` masks padded batch rows (our static-batch padding; the reference
    has ragged final batches instead).  The loss head always computes in f32
    (a no-op cast on the default f32 path; under bf16 mixed precision the
    log/exp and the batch reduction stay full-precision).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    ce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if valid is None:
        return jnp.mean(ce)
    v = valid.astype(ce.dtype)
    return jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)


def bpr_loss(pos_logits, neg_logits, valid=None, clip=True):
    """BPR pairwise loss −mean log σ(pos − neg).

    LSPM clips the sigmoid into [1e-8, 1] before the log
    (reference: LSPM/model.py:99-101); BPR-MF uses −mean log σ(x) directly
    (reference: BPR/model.py:71-72).
    """
    x = pos_logits.astype(jnp.float32) - neg_logits.astype(jnp.float32)
    if clip:
        p = jnp.clip(jax.nn.sigmoid(x), 1e-8, 1.0)
        l = -jnp.log(p)
    else:
        l = jax.nn.softplus(-x)  # −log σ(x), numerically stable
    if valid is None:
        return jnp.mean(l)
    v = valid.astype(l.dtype)
    return jnp.sum(l * v) / jnp.maximum(jnp.sum(v), 1.0)


def l2_tables(*tables):
    """Σ tf.nn.l2_loss(t) = Σ sum(t²)/2 (reference: TLSAN/model.py:164-169).

    Accumulates in f32 regardless of input dtype (no-op on the f32 path;
    under bf16 mixed precision a million-element sum-of-squares in bf16
    would lose the L2 term entirely)."""
    return sum(0.5 * jnp.sum(jnp.square(t.astype(jnp.float32))) for t in tables)


def auc_from_pair(pos_logits, neg_logits, valid=None):
    """Pairwise AUC: fraction of users whose positive outscores the negative
    (reference: TLSAN/model.py:263 `np.mean(res1 - res2 > 0)`)."""
    wins = (pos_logits - neg_logits > 0).astype(jnp.float32)
    if valid is None:
        return jnp.mean(wins)
    v = valid.astype(jnp.float32)
    return jnp.sum(wins * v) / jnp.maximum(jnp.sum(v), 1.0)
