"""EtinyNet-1.0 on ImageNet-224 (976K-param backbone, 117M MAdds per the
paper): the upstream README's flagship EtinyNet configuration."""

name = "etinynet_imagenet"

etinynet_variant = "1.0"
use_asq = False
asq_bits = 4
engine_friendly = False

dataset_name = "imagenet"
batch_size = 256
num_workers = 8
input_size = (224, 224)
num_classes = 1000
subset = 1.0
max_samples_per_split = None

learning_rate = 0.5
weight_decay = 1e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 300
max_grad_norm = 0.0
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
project_name = "etinynet_imagenet"
compiled_backend = "sim"
