"""NNUE QAT with bfloat16 compute (params stay f32; matmuls/conv in bf16)."""

name = "nnue_qat_bf16"

dataset_name = "cifar10"
batch_size = 128
num_workers = 0
num_classes = 10
subset = 1.0
max_samples_per_split = None

l1_size = 1024
l2_size = 128
l3_size = 32
input_size = 32
grid_size = 10
num_features_per_square = 8

qat = True
dtype = "bfloat16"

learning_rate = 0.02
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 20
max_grad_norm = 1.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

use_augmentation = True
augmentation_strength = "light"

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "nnue_qat_bf16"
compiled_backend = "sim"
