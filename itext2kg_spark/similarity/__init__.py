from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_lsh, ann_topk_ivf

__all__ = ["ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf"]
