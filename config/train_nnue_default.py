"""NNUE smoke-test config: tiny model, tiny data, one epoch.

Completes in seconds; used by CI and as the default for `train.py nnue`.
Variable surface matches the production config (config/train_nnue.py).
"""

name = "nnue_default"

# data
dataset_name = "cifar10"
batch_size = 8
num_workers = 0
num_classes = 10
subset = 0.05
max_samples_per_split = 64

# architecture
l1_size = 64
l2_size = 32
l3_size = 8
input_size = 32
grid_size = 10
num_features_per_square = 8

# optimization
learning_rate = 0.01
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 1
max_grad_norm = 1.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

# augmentation
use_augmentation = False
augmentation_strength = "light"

# system
seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "nnue_default"
compiled_backend = "sim"  # per-epoch compiled metrics via TPU int8 sim

print("NNUE default (smoke) config loaded:")
print(f"  batch={batch_size} l1={l1_size} epochs={max_epochs} subset={subset}")
