"""EtinyNet engine-friendly QAT, experiment B: Adam, no augmentation."""

name = "etinynet_qat_b"

etinynet_variant = "micro"
use_asq = False
asq_bits = 4
engine_friendly = True

dataset_name = "cifar10"
batch_size = 128
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = None

learning_rate = 8e-4
weight_decay = 1e-4
momentum = 0.9
optimizer_type = "adam"
max_epochs = 60
max_grad_norm = 1.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

use_augmentation = False
augmentation_strength = "light"

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_qat_b"
compiled_backend = "sim"

synthetic_size = 20000
