"""Masking utilities.

Additive −1e30 masking matches the reference's `exp_mask_for_high_rank`
(TLSAN/model.py:480-483, VERY_NEGATIVE_NUMBER at :10-11) and ATRank's
−2³²+1 key mask (ATRank/model.py:388-393).
"""

import jax.numpy as jnp

VERY_NEGATIVE_NUMBER = -1e30


def sequence_mask(lengths, maxlen: int):
    """Boolean [*, maxlen] mask, True for positions < length
    (≡ tf.sequence_mask, used at TLSAN/model.py:376)."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def additive_neg_mask(logits, mask, value: float = VERY_NEGATIVE_NUMBER):
    """Add `value` where mask is False; mask broadcasts against logits."""
    return logits + (1.0 - mask.astype(logits.dtype)) * value
