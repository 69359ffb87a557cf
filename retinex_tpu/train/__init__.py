"""Training: optimizer/schedules, jitted sharded train step, checkpointing, driver."""

from retinex_tpu.train.schedules import cosine_warm_restarts, step_decay  # noqa: F401
from retinex_tpu.train.train_state import RetinexTrainState, create_train_state, make_train_step  # noqa: F401
