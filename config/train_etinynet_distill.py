"""Format-ceiling oracle (ii): knowledge distillation from the
unconstrained float teacher (val F1 0.9519, logs/runs/run_20260817_024441)
into the engine_friendly student. If the 7-level-activation format can
carry more accuracy than direct QAT finds, the teacher's soft targets
should surface it; if the distilled student lands at the same compiled
accuracy, the gap is an optimization-independent property of the format.
Same progressive schedule as train_etinynet_hard.py plus the KD loss
(alpha·CE + (1−alpha)·T²·KL, training/step.py).
"""

name = "etinynet_distill"

etinynet_variant = "micro"
use_asq = False
asq_bits = 4
engine_friendly = True
ef_warmup_epochs = 25

distill_from = "logs/runs/run_20260817_024441/best_model.ckpt"
distill_alpha = 0.3   # weight on hard-label CE; 0.7 on the teacher KD term
distill_temp = 4.0

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
project_name = "etinynet_distill"
compiled_backend = "sim"
