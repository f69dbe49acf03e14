"""Model registry. Each model module exposes a Model class with the protocol:

  init_params(rng, cfg)                     -> params pytree
  user_repr(params, batch, cate_list, cfg)  -> [B, D] user representation
  item_repr(params, ids, cate_list, cfg)    -> ([B, D] item emb, [B] bias)
  all_item_repr(params, cate_list, cfg)     -> ([I, D], [I]) full catalog
  loss(params, batch, cate_list, cfg)       -> scalar training loss
  pair_logits(params, batch, cate_list, cfg)-> ([B] pos, [B] neg) for AUC
"""

from tlsan_tpu.models.tlsan import TLSAN


_MODEL_MODULES = {
    "tlsan": ("tlsan", "TLSAN"), "shan": ("shan", "SHAN"),
    "atrank": ("atrank", "ATRank"), "bpr": ("bpr", "BPR"),
    "lspm": ("lspm", "LSPM"), "paca": ("paca", "PACA"),
    "cnn": ("cnn", "CNN"), "bilstm": ("bilstm", "BiLSTM"),
    "csan": ("csan", "CSAN"),
}


def get_model(name: str):
    """Resolve a model class by family name; import errors surface as-is
    (a broken model module must not masquerade as an unknown name)."""
    import importlib

    if name not in _MODEL_MODULES:
        raise KeyError(
            f"unknown model {name!r}; one of {sorted(_MODEL_MODULES)}")
    mod_name, cls_name = _MODEL_MODULES[name]
    mod = importlib.import_module(f"tlsan_tpu.models.{mod_name}")
    return getattr(mod, cls_name)
