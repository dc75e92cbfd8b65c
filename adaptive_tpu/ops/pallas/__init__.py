from adaptive_tpu.ops.pallas.fused_step import adaptive_decode_cell_fused

__all__ = ["adaptive_decode_cell_fused"]
