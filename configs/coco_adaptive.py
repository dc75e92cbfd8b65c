# Full MS-COCO training config for the adaptive-attention (visual sentinel)
# model — the knob surface mirrors the reference's cfg_wzn.py with this
# framework's TPU knobs at the bottom. Run: python main.py -c configs/coco_adaptive.py

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
atten_model_name = "adaptive_attention"  # baseline_attention | adaptive_attention | rnn_attention

# -------------------- stages --------------------
resizeOrnot = False
KarpathySplitOrnot = False
vacab_build_Ornot = False
trainOrnot = True
validOrnot = False
testOrnot = False

# -------------------- train --------------------
train_crop_size = 224
train_random_seed = 123
train_num_epochs = 30
train_batch_size = 256          # reference used 24 on 2 GPUs; v5e sustains much larger
train_early_stop = True
train_early_stop_patience = 6
train_evalOrnot = True
train_lstm_maxnormal = 5

# -------------------- optimization --------------------
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
beam_size = 1                   # >1 switches the eval decoder to beam search

# -------------------- TPU --------------------
encoder_backbone = "resnet152"
encoder_pretrained_npz = ""     # set to a converted torchvision resnet152 .npz
compute_dtype = "bfloat16"
vocab_pad_multiple = 128        # 10123 -> 10240: MXU-aligned head, TP-divisible
use_pallas = "auto"
mesh_axes = ("data", "model")
mesh_shape = (-1, 1)            # pure data parallelism over all chips
remat_encoder = False
