"""NNUE test-fixture config: 32 samples, instant run (used by tests/)."""

name = "nnue_test"

dataset_name = "cifar10"
batch_size = 4
num_workers = 0
num_classes = 10
subset = 1.0
max_samples_per_split = 32

l1_size = 32
l2_size = 16
l3_size = 8
input_size = 32
grid_size = 4
num_features_per_square = 4

learning_rate = 0.01
weight_decay = 0.0
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 1
max_grad_norm = 1.0
use_cosine_scheduler = False
decay_lr = False
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

use_augmentation = False
augmentation_strength = "light"

seed = 42
deterministic = True
keep_alive = False
log_dir = "logs"
project_name = "nnue_test"
compiled_backend = "sim"
