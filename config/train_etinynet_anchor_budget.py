"""Our side of the EtinyNet cross-framework accuracy anchor (VERDICT r4
item 2 — the cell where the reference demonstrably LEARNS).

scripts/reference_anchor.py --model etinynet trains the reference's own
EtinyNet (upstream models + trainer verbatim, one documented dedent of
its duplicate-target crash at evaluate.py:328-333) on the synthetic-hard
variant-A task exported in CIFAR batch format; this config trains OUR
framework on the identical task at the identical budget so both land in
one PARITY.md row. Hyperparameters mirror the anchor cell exactly:
EtinyNet-0.75, SGD lr 0.1, momentum 0.9, weight decay 2e-4, grad clip
1.0, batch 256, light augmentation, 60 epochs, CONSTANT lr (the
reference's scheduler flag is inert — its get_lr is never called;
SURVEY §2.14), seed 42.

Plain float training (engine_friendly=False, no QAT) because that is
what the reference cell does — its post-training .etiny quantization
then collapses to chance (compiled 0.086 while float is 0.98), which is
exactly the deployment gap our engine_friendly QAT configs close; the
deployable-path companion row comes from this config with
engine_friendly QAT toggled on (--set via train.py overrides).
"""

name = "etinynet_anchor_budget"

etinynet_variant = "0.75"
use_asq = False
asq_bits = 4
engine_friendly = False

# data — identical draw to the anchor export: synthetic-hard variant A,
# train seed 42 first 5000; test split = seed 10042 draw (n=1250; the
# reference scores on its first 500 — a subset of the same images)
dataset_name = "synthetic-hard"
synthetic_size = 5000
batch_size = 256
num_workers = 0
input_size = (32, 32)
num_classes = 10
subset = 1.0
max_samples_per_split = None

# optimization — the anchor cell's values, constant lr
learning_rate = 0.1
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 60
max_grad_norm = 1.0
use_cosine_scheduler = False
decay_lr = False
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

use_augmentation = True
augmentation_strength = "light"
steps_per_dispatch = 19  # one epoch (5000//256 drop_last) per dispatch

seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "etinynet_anchor_budget"
compiled_backend = "sim"

eval_train_samples = 2560
eval_batch_size = 1024
