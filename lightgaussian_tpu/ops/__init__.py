from lightgaussian_tpu.ops import sh, covariance, losses, knn  # noqa: F401
