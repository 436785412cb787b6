from .norms import rms_norm, gemma_rms_norm
from .rope import precompute_rope_cache, apply_rope
from .masks import causal_mask_rows, tree_mask_rows
from . import sampling
