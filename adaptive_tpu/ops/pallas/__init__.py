from adaptive_tpu.ops.pallas.fused_step import (
    adaptive_attention_step_fused,
    adaptive_decode_cell_fused,
)

__all__ = ["adaptive_attention_step_fused", "adaptive_decode_cell_fused"]
