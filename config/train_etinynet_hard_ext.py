"""Format-ceiling oracle (i): the 150-epoch progressive run was still
rising at cutoff (VERDICT r2 weak #3) — extend the identical recipe to 400
epochs so compiled accuracy demonstrably plateaus. Same task, same
progressive engine_friendly QAT as config/train_etinynet_hard.py; only the
schedule length (and therefore the cosine decay span) changes.
"""

name = "etinynet_hard_ext"

etinynet_variant = "micro"
use_asq = False
asq_bits = 4
engine_friendly = True
ef_warmup_epochs = 25

dataset_name = "synthetic-hard"
synthetic_size = 20000
batch_size = 256
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = None

learning_rate = 8e-4
weight_decay = 1e-4
momentum = 0.9
optimizer_type = "adam"
max_epochs = 400
max_grad_norm = 1.0
use_cosine_scheduler = True
decay_lr = True
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

use_augmentation = True
augmentation_strength = "light"
steps_per_dispatch = 26

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_hard_ext"
compiled_backend = "sim"
