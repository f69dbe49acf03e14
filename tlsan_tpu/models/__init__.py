"""Model registry. Each model module exposes a Model class with the protocol:

  init_params(rng, cfg)                     -> params pytree
  user_repr(params, batch, cate_list, cfg)  -> [B, D] user representation
  item_repr(params, ids, cate_list, cfg)    -> ([B, D] item emb, [B] bias)
  all_item_repr(params, cate_list, cfg)     -> ([I, D], [I]) full catalog
  loss(params, batch, cate_list, cfg)       -> scalar training loss
  pair_logits(params, batch, cate_list, cfg)-> ([B] pos, [B] neg) for AUC
"""

from tlsan_tpu.models.tlsan import TLSAN


def get_model(name: str):
    from tlsan_tpu.models import tlsan

    registry = {"tlsan": tlsan.TLSAN}
    try:
        from tlsan_tpu.models import shan
        registry["shan"] = shan.SHAN
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import atrank
        registry["atrank"] = atrank.ATRank
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import bpr
        registry["bpr"] = bpr.BPR
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import lspm
        registry["lspm"] = lspm.LSPM
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import paca
        registry["paca"] = paca.PACA
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import cnn
        registry["cnn"] = cnn.CNN
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import bilstm
        registry["bilstm"] = bilstm.BiLSTM
    except ImportError:
        pass
    try:
        from tlsan_tpu.models import csan
        registry["csan"] = csan.CSAN
    except ImportError:
        pass
    return registry[name]
