"""NNUE production config: CIFAR-10, ~1M-parameter model, 300 epochs.

SGD + momentum with cosine annealing (actually wired in this framework —
the upstream flag was inert), light augmentation, gradient clipping.
"""

name = "nnue_vision"

# data
dataset_name = "cifar10"
batch_size = 512
num_workers = 8
num_classes = 10
subset = 1.0

# architecture (~1M params: 800-feature grid, L1=1024)
l1_size = 1024
l2_size = 128
l3_size = 32
input_size = 32
grid_size = 10
num_features_per_square = 8

# optimization
learning_rate = 0.01
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 300
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
project_name = "nnue_training"
compiled_backend = "sim"  # "sim" (TPU int8 sim) / "pallas" (fused kernel) / "engine" (C++ subprocess)

print("NNUE production config loaded:")
print(f"  batch={batch_size} l1={l1_size} epochs={max_epochs} "
      f"lr={learning_rate} aug={augmentation_strength}")

# Deployment-grade training: fake-quantize to the engine's exact arithmetic
# so serialized int8 accuracy equals float accuracy.
qat = True
# air-gapped hosts: synthetic fallback training-set size
synthetic_size = 20000
