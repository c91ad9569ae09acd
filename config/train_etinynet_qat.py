"""EtinyNet engine-friendly (quantization-aware) training config.

Trains the exact function the int8 engine represents (scale-only mid-block
norms, engine activation grids); serialized .etiny accuracy then tracks
the float model.
"""

name = "etinynet_qat"

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

# Adam handles the noisy straight-through-quantizer gradients far better
# than SGD here (measured: SGD plateaus near chance, Adam learns).
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

use_augmentation = True
augmentation_strength = "light"

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_qat"
compiled_backend = "sim"
