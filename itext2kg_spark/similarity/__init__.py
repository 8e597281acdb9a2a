from itext2kg_spark.similarity.ann import ann_topk_bruteforce, ann_topk_lsh

__all__ = ["ann_topk_bruteforce", "ann_topk_lsh"]
