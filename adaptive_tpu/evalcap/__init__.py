from adaptive_tpu.evalcap.eval import COCOEvalCap

__all__ = ["COCOEvalCap"]
