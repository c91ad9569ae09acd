"""EtinyNet smoke-test config: micro variant, tiny data, one epoch."""

name = "etinynet_default"

# model
etinynet_variant = "micro"
use_asq = False
asq_bits = 4

# data
dataset_name = "cifar10"
batch_size = 8
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 0.05
max_samples_per_split = 64

# optimization
learning_rate = 1e-3
weight_decay = 1e-4
optimizer_type = "adam"
max_epochs = 1
max_grad_norm = 0.0
use_cosine_scheduler = False
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

# augmentation
use_augmentation = False
augmentation_strength = "light"

# system
seed = 42
deterministic = True
keep_alive = False
log_dir = "logs"
project_name = "etinynet_default"
compiled_backend = "sim"
