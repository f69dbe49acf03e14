from tlsan_tpu.nn.init import glorot_uniform, zeros_init, constant_init
from tlsan_tpu.nn.masks import sequence_mask, additive_neg_mask, VERY_NEGATIVE_NUMBER
