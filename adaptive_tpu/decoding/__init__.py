from adaptive_tpu.decoding.greedy import make_greedy_decoder
from adaptive_tpu.decoding.beam import make_beam_decoder

__all__ = ["make_greedy_decoder", "make_beam_decoder"]
