from dachshund_spark.pipeline import dedup, jpeg, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal", "jpeg"]
