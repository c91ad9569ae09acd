"""Format-ceiling oracle (iii): train INSIDE the exact 7-level activation
arithmetic from epoch 0 (no float warmup) at the same 150-epoch budget as
the progressive run. Round-2 measured this unstable with the then-current
recipe (peaks ~0.36, collapses); this run is the controlled re-measurement
that pins down whether progressive warmup is load-bearing or incidental.
Constraint being probed: the engine's ReLU6-as-clamp[0,6] activations
(/root/reference/engine/src/nnue_engine.cpp:918,946).
"""

name = "etinynet_hard_scratch"

etinynet_variant = "micro"
use_asq = False
asq_bits = 4
engine_friendly = True
ef_warmup_epochs = 0  # the only change vs train_etinynet_hard.py

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
max_epochs = 150
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
project_name = "etinynet_hard_scratch"
compiled_backend = "sim"
