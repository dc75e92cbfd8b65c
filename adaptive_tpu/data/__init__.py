from adaptive_tpu.data.vocab import Vocabulary, build_vocab, main_build_vocab
from adaptive_tpu.data.tokenizer import caption_tokenize

__all__ = ["Vocabulary", "build_vocab", "main_build_vocab", "caption_tokenize"]
