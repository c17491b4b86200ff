"""Compression passes: GSS pruning scores, SH distillation, VecTree VQ."""
from lightgaussian_tpu.compress.vectree import (  # noqa: F401
    VQConfig,
    load_extreme,
    load_vq_scene,
    quantize_features,
    quantize_scene,
    save_extreme,
)
from lightgaussian_tpu.compress.vq import (  # noqa: F401
    CodebookState,
    init_codebook,
    nearest_code,
    train_codebook,
    train_codebook_sharded,
)
