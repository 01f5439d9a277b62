from occm_tpu.classify.scoring import (
    OneClassScorer, BucketedEmbedder, make_dp_mesh,
)

__all__ = ["OneClassScorer", "BucketedEmbedder", "make_dp_mesh"]
