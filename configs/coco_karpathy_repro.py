# One-command MS-COCO Karpathy quality-parity reproduction (RUNBOOK.md).
#
#   bash adaptive_tpu/data/download.sh data/MSCOCO     # once, ~25 GB
#   python examples/convert_weights.py resnet --pth resnet152.pth \
#       --arch resnet152 --out data/resnet152.npz      # once, torch host
#   python main.py -c configs/coco_karpathy_repro.py
#
# runs resize -> Karpathy split -> vocab -> 30-epoch train (reference
# schedule: Adam 1e-3/1e-5, plateau decay, CNN fine-tune from epoch 20,
# early stop patience 6) -> Karpathy-TEST eval on the best-CIDEr checkpoint.
# Target: CIDEr within 0.1 of the paper's 1.085 (BASELINE.md), expected to
# land near it in bf16. Projected wall-clock on one v5e chip from the
# measured 81 s/epoch fine-tune / 32 s pre-fine-tune chip compute
# (VALIDATION.md): ~25 min of TPU compute for 30 epochs + per-epoch eval;
# end-to-end time is dominated by host JPEG decode unless the input host has
# several cores. On a v5e-8 use configs/coco_adaptive_v5e8.py's scale-out
# block (mesh/ZeRO-1/accum) on top of this file.

# -------------------- paths --------------------
experiment_path = "Experiments"
vocab_path = "data/vocab.json"
image_dir = "data/MSCOCO"
resized_image_dir = image_dir + "/resized"
captions_val_origin = image_dir + "/annotations/captions_val2014.json"
captions_train_origin = image_dir + "/annotations/captions_train2014.json"
splited_anno_path_prefix = "data/annotations/karpathy_split_"
train_anno_path = "data/annotations/karpathy_split_train.json"
val_anno_path = "data/annotations/karpathy_split_val.json"
test_anno_path = "data/annotations/karpathy_split_test.json"
train_eval_anno_path = "data/annotations/karpathy_split_train_eval.json"

# -------------------- model --------------------
atten_model_name = "adaptive_attention"

# -------------------- stages: the full pipeline --------------------
resizeOrnot = True              # 256x256 LANCZOS into resized/ (resize.py)
KarpathySplitOrnot = True       # seeded 8-way split (karpathy_split.py)
vacab_build_Ornot = True        # threshold-5 vocab -> data/vocab.json
trainOrnot = True
validOrnot = False
testOrnot = True                # Karpathy test on the best checkpoint
test_pretrained_model = "auto"  # resolve best cider-*_model-N of this run

# -------------------- train: the reference schedule --------------------
train_crop_size = 224
train_random_seed = 123
train_num_epochs = 30
train_batch_size = 256
train_early_stop = True
train_early_stop_patience = 6
train_evalOrnot = True          # per-epoch val CIDEr drives plateau + stop
train_lstm_maxnormal = 5

# -------------------- optimization (cfg_wzn.py:37-75 parity) ----------
opt_fine_tune_cnn_start_layer = 5
opt_fine_tune_cnn_start_epoch = 20
opt_lrdecay_patience = 3
opt_lrdecay_factor = 0.5
opt_rnn_optimization = "adam"
opt_rnn_adam_alpha = 0.8
opt_rnn_adam_beta = 0.999
opt_rnn_adam_learning_rate = 1e-3
opt_cnn_optimization = "adam"
opt_cnn_adam_learning_rate = 1e-5

# -------------------- eval --------------------
eval_batch_size = 512
decode_max_len = 30
beam_size = 1                   # greedy == the reference's sampler

# -------------------- TPU --------------------
encoder_backbone = "resnet152"
encoder_pretrained_npz = "data/resnet152.npz"  # examples/convert_weights.py
compute_dtype = "bfloat16"
vocab_pad_multiple = 128
use_pallas = "auto"
mesh_axes = ("data", "model")
mesh_shape = (-1, 1)
train_auto_resume_dir = "Experiments/coco_karpathy_repro_ckpts"
