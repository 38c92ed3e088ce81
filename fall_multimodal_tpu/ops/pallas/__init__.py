from fall_multimodal_tpu.ops.pallas.stgcan_block import (
    FoldedBlockParams,
    fold_bn,
    fold_block_params,
    fused_stgcan_block,
)

__all__ = [
    "FoldedBlockParams",
    "fold_bn",
    "fold_block_params",
    "fused_stgcan_block",
]
