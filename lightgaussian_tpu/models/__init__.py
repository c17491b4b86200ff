from lightgaussian_tpu.models.camera import Camera  # noqa: F401
from lightgaussian_tpu.models.gaussians import GaussianScene  # noqa: F401
