from occm_tpu.classify.scoring import OneClassScorer, BucketedEmbedder

__all__ = ["OneClassScorer", "BucketedEmbedder"]
