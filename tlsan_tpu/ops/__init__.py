from tlsan_tpu.ops.feature_attention import (
    feature_wise_attention,
    feature_wise_attention_reference,
)
