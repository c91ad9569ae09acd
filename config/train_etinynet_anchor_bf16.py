"""bfloat16-compute row of the EtinyNet accuracy anchor.

Identical to config/train_etinynet_anchor_prod.py in every respect but
one: the model computes in bfloat16 (convs/matmuls on the MXU in bf16;
params, norm statistics, and the loss stay float32 — models/etinynet.py
`_batch_norm`). This is the accuracy-validation cell for making mixed
precision the EtinyNet production training mode on TPU: the throughput
win is measured in docs/TRAIN_ROOFLINE.md (round 5), and this run pins
that the anchor-cell accuracy is preserved (PARITY.md round-5 table).
"""

name = "etinynet_anchor_bf16"

etinynet_variant = "0.75"
use_asq = False
asq_bits = 4
engine_friendly = False
dtype = "bfloat16"

dataset_name = "synthetic-hard"
synthetic_size = 5000
batch_size = 256
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = None

learning_rate = 0.1
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
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
project_name = "etinynet_anchor_bf16"
compiled_backend = "sim"

eval_train_samples = 2560
eval_batch_size = 1024
