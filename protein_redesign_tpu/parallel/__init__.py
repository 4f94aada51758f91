"""Device-mesh construction and pjit train/sample steps."""

from .mesh import make_mesh, batch_sharding, param_sharding, replicated
from .train_step import TrainState, make_train_state, make_train_step
