from .ppo import ImitationPPO, PPOConfig, TrainState  # noqa: F401
from . import networks, running_norm  # noqa: F401
