from .humanoid_im import HumanoidImEnv, HumanoidImConfig, EnvState, StepOutput  # noqa: F401
from .tennis import TennisEnv, TennisConfig, TennisState  # noqa: F401
from .tennis_dual import DualTennisEnv  # noqa: F401
from . import obs  # noqa: F401
