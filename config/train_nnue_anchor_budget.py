"""Our side of the cross-framework accuracy anchor (VERDICT r3 item 2).

scripts/reference_anchor.py trains the UNMODIFIED reference stack on the
synthetic-hard variant-A task exported in CIFAR batch format; this config
trains OUR framework on the identical task at the identical budget so the
two land in one PARITY.md table row. Hyperparameters mirror the anchor
config staged into the reference tree (reference production values,
config/train_nnue.py:16-49 upstream): SGD lr 0.01, momentum 0.9, weight
decay 2e-4, grad clip 1.0, batch 512, light augmentation, CONSTANT lr —
the reference's `use_cosine_scheduler` flag is inert (its get_lr is never
called by train.py; SURVEY §2.14), so ours is pinned off too for an
equal effective schedule. Epoch budget is set by the harness (the r4
anchor ran 30 epochs; override with --max_epochs to match).

qat=True is OUR production training mode — its float metrics are still
float-model metrics, and its compiled (int8 engine) accuracy is the
deployable number the reference's post-training quantization is being
compared against.
"""

name = "nnue_anchor_budget"

# data — identical draw to the anchor export (class_seed default =
# variant A, train seed 42, test split seed 42+10000)
dataset_name = "synthetic-hard"
synthetic_size = 20000
batch_size = 512
num_workers = 0
num_classes = 10
subset = 1.0
max_samples_per_split = None

# architecture (production shape, = the anchor's reference config)
l1_size = 1024
l2_size = 128
l3_size = 32
input_size = 32
grid_size = 10
num_features_per_square = 8

qat = True

# optimization — reference production values, constant lr (see docstring)
learning_rate = 0.01
weight_decay = 2e-4
momentum = 0.9
optimizer_type = "sgd"
max_epochs = 30
max_grad_norm = 1.0
use_cosine_scheduler = False
decay_lr = False
use_cyclical_lr = False
cyclical_lr_period = 1000
cyclical_lr_amplitude = 0.1

# augmentation — the reference light tier
use_augmentation = True
augmentation_strength = "light"
steps_per_dispatch = 39  # one epoch per device dispatch

# system
seed = 42
deterministic = False
keep_alive = False
log_dir = "logs"
project_name = "nnue_anchor_budget"
compiled_backend = "sim"

# per-epoch eval cost controls (resident eval slicing)
eval_train_samples = 2560
eval_batch_size = 1024
