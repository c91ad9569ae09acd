"""NNUE quantization-aware training config.

Trains with the engine's dynamic-range clamps in the forward pass
(cfg.qat), so the serialized int8 model's accuracy tracks the float
model's. Sized to demonstrate learning + compiled parity quickly
(synthetic fallback when CIFAR is not on disk).
"""

name = "nnue_qat"

# data
dataset_name = "cifar10"
batch_size = 128
num_workers = 0
num_classes = 10
subset = 1.0
max_samples_per_split = None

# architecture (production shape)
l1_size = 1024
l2_size = 128
l3_size = 32
input_size = 32
grid_size = 10
num_features_per_square = 8

# quantization-aware training
qat = True

# optimization
learning_rate = 0.02
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 30
max_grad_norm = 1.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

# augmentation
use_augmentation = True
augmentation_strength = "light"

# system
seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "nnue_qat"
compiled_backend = "sim"
