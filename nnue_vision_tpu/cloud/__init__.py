"""Cloud orchestration: TPU-VM / pod launcher with the upstream workflow."""

from nnue_vision_tpu.cloud.launcher import (  # noqa: F401
    check_git_status,
    start_cloud_training,
    stop_instance,
)
