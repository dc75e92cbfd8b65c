"""adaptive_tpu — a TPU-native JAX framework for adaptive-attention image captioning.

A ground-up rebuild of the capabilities of wzn0828/Adaptive ("Knowing When to
Look: Adaptive Attention via a Visual Sentinel", Lu et al., CVPR 2017):
config-driven multi-stage pipeline (resize -> Karpathy split -> vocabulary ->
teacher-forced training -> decode + COCO caption metrics) re-designed for TPU:

* compute path: jax / XLA / Pallas; encoder + fused scan decoder, one jitted
  SPMD train step over a `jax.sharding.Mesh` (reference: ad-hoc
  `torch.nn.DataParallel`, per-token Python LSTM loops).
* runtime: pure-Python orchestration + a C++ native layer for the RLE mask
  ops that the reference vendors as C/Cython (coco/common/maskApi.c).

Package map (reference parity is cited per-module against /root/reference):
  config/    typed configuration + experiment dirs   (code_src/config/)
  data/      vocab, tokenizer, Karpathy split, COCO annotation API, loaders
  ops/       LSTM / attention / preprocessing math + Pallas TPU kernels
  models/    ResNet encoder + baseline/adaptive/rnn attention decoders
  parallel/  mesh + sharding rules (DP batch sharding, TP vocab head)
  training/  jitted train step, dual optimizers, plateau LR, checkpoints
  decoding/  batched greedy (lax.scan) and beam search with EOS masking
  evalcap/   clean-room BLEU / CIDEr / ROUGE-L / METEOR + PTB tokenizer
  native/    C++ RLE mask library (ctypes-bound CPython-free shared lib)
  utils/     logging tee, metric writer, profiling harness
"""

__version__ = "0.1.0"
