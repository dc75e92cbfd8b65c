# Multi-chip (v5e-8) production training config for the adaptive-attention
# model: 4-way data parallel x 2-way tensor parallel, ZeRO-1 optimizer-state
# sharding, gradient accumulation for a 512 effective batch, and auto-resume
# for preemptible capacity. Run: python main.py -c configs/coco_adaptive_v5e8.py
#
# Differences from configs/coco_adaptive.py are all at the bottom under
# "TPU scale-out" — the model/optimizer surface is identical.

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

# -------------------- stages --------------------
trainOrnot = True
train_evalOrnot = True

# -------------------- train --------------------
train_crop_size = 224
train_num_epochs = 30
train_batch_size = 512          # effective; see train_grad_accum_steps
opt_fine_tune_cnn_start_epoch = 20
compute_dtype = "bfloat16"

# -------------------- TPU scale-out --------------------
# 8 chips as 4-way data parallel x 2-way tensor parallel: the batch splits
# over 'data'; the 10240-padded vocab embedding/head split over 'model'.
mesh_shape = (-1, 2)
# TP requires the vocab dim divisible by the model axis: pad 10,123 -> 10,240
# (also the MXU lane alignment). Without this, TP silently degrades to
# replication (parallel/mesh.py divisibility guard).
vocab_pad_multiple = 128
# ZeRO-1: Adam moments sharded over the data axis (~1/4 the optimizer HBM
# per chip, numerically identical updates — parallel/mesh.py).
opt_state_sharding = "data"
# 2 microbatches/step: exact full-batch gradient at half the activation
# memory (training/step.py) — room for the CNN fine-tune phase at batch 512.
train_grad_accum_steps = 2
# Preemptible capacity: checkpoints land in this stable dir and any restart
# with this same config resumes from the newest complete one.
train_auto_resume_dir = "Experiments/coco_adaptive_v5e8_ckpts"
# Multi-host slices: flip on to call jax.distributed.initialize() at startup.
distributed_init = False
