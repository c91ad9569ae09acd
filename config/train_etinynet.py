"""EtinyNet production config: 0.98M variant on CIFAR-10, heavy aug.

Matches the EtinyNet paper recipe the upstream config targets: SGD with
high initial LR + cosine annealing over a long run.
"""

name = "etinynet_cifar10"

# model
etinynet_variant = "0.98M"
use_asq = False
asq_bits = 4
# TPU production mode: bf16 convs/matmuls/activations, f32 params +
# norm statistics + loss (ARCHITECTURE item 15). Accuracy-validated on
# the anchor cell (PARITY.md round 5: 0.980 == the f32 row); measured
# 235k -> 261k img/s on this config's step (TRAIN_ROOFLINE round 5).
# Set to "float32" to reproduce the strict-f32 numbers.
dtype = "bfloat16"

# data
dataset_name = "cifar10"
batch_size = 1024
num_workers = 8
input_size = (32, 32)
num_classes = 10
subset = 1.0

# optimization
learning_rate = 0.5
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 800
max_grad_norm = 0.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

# augmentation
use_augmentation = True
augmentation_strength = "heavy"

# system
seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_training"
compiled_backend = "sim"
