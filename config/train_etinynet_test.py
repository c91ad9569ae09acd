"""EtinyNet test-fixture config: 32 samples, instant run (used by tests/)."""

name = "etinynet_test"

etinynet_variant = "micro"
use_asq = False
asq_bits = 4

dataset_name = "cifar10"
batch_size = 4
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = 32

learning_rate = 1e-3
weight_decay = 0.0
optimizer_type = "adam"
max_epochs = 1
max_grad_norm = 0.0
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
project_name = "etinynet_test"
compiled_backend = "sim"
