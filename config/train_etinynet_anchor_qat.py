"""Deployable-path companion to the EtinyNet accuracy anchor.

Same task and 60-epoch budget as config/train_etinynet_anchor_budget.py
(synthetic-hard variant A, 5k train draw seed 42, batch 256, light
augmentation), but trained with OUR production deployable recipe —
engine_friendly progressive QAT (float warmup then the 7-level
engine-exact function) with Adam, the recipe from
config/train_etinynet_hard.py. The reference cell's float model reaches
~0.98 but its post-training .etiny quantization deploys at chance
(compiled 0.086 — upstream serialize.py's non-engine-friendly collapse,
the failure our serialize.py guardrail warns about); this config is the
row showing the deployed-accuracy story at the same budget.
"""

name = "etinynet_anchor_qat"

etinynet_variant = "0.75"
use_asq = False
asq_bits = 4
engine_friendly = True
ef_warmup_epochs = 25

dataset_name = "synthetic-hard"
synthetic_size = 5000
batch_size = 256
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = None

# our production deployable optimizer (train_etinynet_hard.py): Adam
# handles the straight-through-quantizer gradients; cosine decay wired
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
steps_per_dispatch = 19

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_anchor_qat"
compiled_backend = "sim"

eval_train_samples = 2560
eval_batch_size = 1024
