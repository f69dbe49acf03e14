from tlsan_tpu.serve.recommender import Recommender

__all__ = ["Recommender"]
