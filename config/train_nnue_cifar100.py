"""NNUE CIFAR-100: production architecture with 100 classes, QAT on,
full augmentation pipeline."""

name = "nnue_cifar100"

dataset_name = "cifar100"
batch_size = 128
num_workers = 8
num_classes = 100
subset = 1.0
max_samples_per_split = None

l1_size = 1024
l2_size = 128
l3_size = 32
input_size = 32
grid_size = 10
num_features_per_square = 8

qat = True

learning_rate = 0.02
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

use_augmentation = True
augmentation_strength = "medium"

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "nnue_cifar100"
compiled_backend = "sim"

# air-gapped hosts: size of the synthetic fallback training set
synthetic_size = 20000
